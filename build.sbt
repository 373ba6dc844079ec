ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lucenesearchenginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g measured faster than 16g/48g at local[32]: big G1 heaps + 32
  // allocation-heavy threads hit pathological pause behavior. The knob is
  // deliberately GRAFT_-prefixed: a generic name (SPARK_DRIVER_MEM) was
  // honored from the ambient environment in round 1 and silently ran the
  // bench on a ~89 GiB heap (block manager logged 53.2 GiB storage),
  // which is exactly the GC-collapse regime — 5.5k docs/s instead of 43k.
  s"-Xmx${sys.env.getOrElse("GRAFT_XMX", "8g")}",
  // posting blobs and reader batch vectors are multi-MB byte arrays; at
  // the default ~4 MB G1 regions (8g heap) every one of them is a
  // HUMONGOUS allocation and 32 allocation-heavy threads fragment the
  // heap into premature OOM (20M-doc dress, head-term phrase leg). 16 MB
  // regions put the 2-3 MB steady-state allocations back on the normal
  // TLAB path.
  "-XX:G1HeapRegionSize=16m",
)
