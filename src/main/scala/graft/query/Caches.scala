package graft.query

/** Driver-side LRU caches — the serving-layer analog of the reference's
  * query-result / document / facet LRU caches
  * (`/root/reference/LuceneSearchEngine/src/Searcher.java:130-142`,
  * result cache :885-947, doc cache :703-720, facet cache :1589-1612).
  * Spark-side reuse of heavy inputs is separate (persisted docstore /
  * term_stats); these memoize the final, small, collected results. */
final class LruCache[K, V](capacity: Int) {
  require(capacity > 0)
  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > capacity
  }
  private var hitCount = 0L
  private var missCount = 0L

  def get(k: K): Option[V] = synchronized {
    val v = map.get(k)
    if (v == null) { missCount += 1; None } else { hitCount += 1; Some(v) }
  }
  def put(k: K, v: V): Unit = synchronized { map.put(k, v); () }
  def getOrElseUpdate(k: K)(compute: => V): V = get(k) match {
    case Some(v) => v
    case None => val v = compute; put(k, v); v
  }
  def size: Int = synchronized(map.size())
  /** Snapshot of the keys, least- to most-recently used. */
  def keys: Seq[K] = synchronized {
    val out = Vector.newBuilder[K]
    map.keySet.forEach(k => out += k)
    out.result()
  }
  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def clear(): Unit = synchronized(map.clear())
}
