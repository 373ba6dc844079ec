package graft.codec;

import java.lang.invoke.MethodHandles;
import java.lang.invoke.VarHandle;
import java.nio.ByteOrder;

/**
 * Fixed-width bit packing (FoR block bodies, posting format v3 — see
 * {@link VarByte}). Values are laid out LSB-first: value {@code i} of
 * width {@code w} occupies absolute bits {@code [i*w, (i+1)*w)} of the
 * section, each byte filled from its least-significant bit up.
 *
 * <p>The unpack loops are the decode hot kernel: one unaligned
 * little-endian 64-bit load + shift + mask per value (two loads when the
 * value straddles a word boundary, i.e. only for widths &gt; 57 or odd
 * phases) — no per-byte continuation branches, which is exactly what
 * makes this 5-10x faster than LEB128 varints on the same data. Java,
 * not Scala: {@code byteArrayViewVarHandle} calls are signature-
 * polymorphic, which scalac cannot emit natively.
 *
 * <p>CONTRACT: callers must guarantee {@code bytes} extends at least 16
 * bytes past the last packed section ({@link VarByte} pads every v3 blob
 * with 16 trailing zero bytes) — the unpack loops read whole words
 * unconditionally.
 */
public final class BitPack {

  private static final VarHandle LE =
      MethodHandles.byteArrayViewVarHandle(long[].class, ByteOrder.LITTLE_ENDIAN);

  private BitPack() {}

  /** Byte length of a packed section of {@code n} values at width {@code w}. */
  public static int packedBytes(int n, int w) {
    return (n * w + 7) >> 3;
  }

  /** Bits needed to represent {@code v} (0 for 0). */
  public static int width(long v) {
    return 64 - Long.numberOfLeadingZeros(v);
  }

  /** Pack {@code n} longs from {@code vals[from..)} at width {@code w}. */
  public static byte[] pack(long[] vals, int from, int n, int w) {
    byte[] out = new byte[packedBytes(n, w)];
    if (w == 0) return out;
    for (int i = 0; i < n; i++) {
      long v = vals[from + i];
      int bitPos = i * w;
      int remaining = w;
      while (remaining > 0) {
        int byteIdx = bitPos >> 3;
        int bitOff = bitPos & 7;
        int take = Math.min(8 - bitOff, remaining);
        out[byteIdx] |= (byte) ((v & ((1L << take) - 1)) << bitOff);
        v >>>= take;
        bitPos += take;
        remaining -= take;
      }
    }
    return out;
  }

  /** Pack {@code n} ints from {@code vals[from..)} at width {@code w}. */
  public static byte[] packInts(int[] vals, int from, int n, int w) {
    byte[] out = new byte[packedBytes(n, w)];
    if (w == 0) return out;
    for (int i = 0; i < n; i++) {
      long v = vals[from + i] & 0xFFFFFFFFL;
      int bitPos = i * w;
      int remaining = w;
      while (remaining > 0) {
        int byteIdx = bitPos >> 3;
        int bitOff = bitPos & 7;
        int take = Math.min(8 - bitOff, remaining);
        out[byteIdx] |= (byte) ((v & ((1L << take) - 1)) << bitOff);
        v >>>= take;
        bitPos += take;
        remaining -= take;
      }
    }
    return out;
  }

  /** One value at absolute bit position {@code bitPos} of width {@code w}. */
  private static long readBits(byte[] bytes, int bitPos, int w, long mask) {
    int b = bitPos >>> 3;
    int sh = bitPos & 7;
    long v = ((long) LE.get(bytes, b)) >>> sh;
    int got = 64 - sh;
    if (w > got) v |= ((long) LE.get(bytes, b + 8)) << got;
    return v & mask;
  }

  /** Unpack {@code n} ints of width {@code w} from the section starting at
   * {@code baseByte} into {@code out[outOff..)}.
   *
   * <p>Groups of 8 values start byte-aligned (8·w bits = w bytes), so the
   * common widths run unrolled group loops — one 64-bit load per group
   * for w ≤ 8, two for w ≤ 16 — instead of a load per value; widths
   * above 16 (rare: huge docId gaps of sparse terms, i.e. short lists)
   * take the generic per-value path. */
  public static void unpackInts(byte[] bytes, int baseByte, int n, int w,
                                int[] out, int outOff) {
    if (w == 0) {
      java.util.Arrays.fill(out, outOff, outOff + n, 0);
      return;
    }
    long mask = (w == 64) ? -1L : (1L << w) - 1L;
    int i = 0;
    if (w <= 8) {
      int nG = n & ~7;
      for (; i < nG; i += 8) {
        long v = (long) LE.get(bytes, baseByte + ((i * w) >> 3));
        int o = outOff + i;
        out[o] = (int) (v & mask);
        out[o + 1] = (int) ((v >>> w) & mask);
        out[o + 2] = (int) ((v >>> (2 * w)) & mask);
        out[o + 3] = (int) ((v >>> (3 * w)) & mask);
        out[o + 4] = (int) ((v >>> (4 * w)) & mask);
        out[o + 5] = (int) ((v >>> (5 * w)) & mask);
        out[o + 6] = (int) ((v >>> (6 * w)) & mask);
        out[o + 7] = (int) ((v >>> (7 * w)) & mask);
      }
    } else if (w <= 16) {
      int nG = n & ~7;
      for (; i < nG; i += 8) {
        int base = baseByte + ((i * w) >> 3);
        long lo = (long) LE.get(bytes, base);
        long hi = (long) LE.get(bytes, base + 8);
        int o = outOff + i;
        for (int j = 0; j < 8; j++) {
          int start = j * w; // up to 7*16=112: route by which word(s) hold it
          long v;
          if (start >= 64) v = hi >>> (start - 64);
          else {
            v = lo >>> start;
            if (start + w > 64) v |= hi << (64 - start);
          }
          out[o + j] = (int) (v & mask);
        }
      }
    }
    int bitPos = (baseByte << 3) + i * w;
    for (; i < n; i++) {
      out[outOff + i] = (int) readBits(bytes, bitPos, w, mask);
      bitPos += w;
    }
  }

  /** Unpack {@code n} docId GAPS of width {@code w} and prefix-sum them
   * onto {@code prev}, writing absolute docIds into {@code out[outOff..)};
   * returns the last docId (== prev when n == 0). Same group fast paths
   * as {@link #unpackInts}. */
  public static long unpackGapsPrefix(byte[] bytes, int baseByte, int n, int w,
                                      long prev, long[] out, int outOff) {
    if (w == 0) {
      // all-zero gaps: only legal as the single docId-0 first entry
      for (int i = 0; i < n; i++) out[outOff + i] = prev;
      return prev;
    }
    long mask = (w == 64) ? -1L : (1L << w) - 1L;
    int i = 0;
    if (w <= 8) {
      int nG = n & ~7;
      for (; i < nG; i += 8) {
        long v = (long) LE.get(bytes, baseByte + ((i * w) >> 3));
        int o = outOff + i;
        out[o] = (prev += v & mask);
        out[o + 1] = (prev += (v >>> w) & mask);
        out[o + 2] = (prev += (v >>> (2 * w)) & mask);
        out[o + 3] = (prev += (v >>> (3 * w)) & mask);
        out[o + 4] = (prev += (v >>> (4 * w)) & mask);
        out[o + 5] = (prev += (v >>> (5 * w)) & mask);
        out[o + 6] = (prev += (v >>> (6 * w)) & mask);
        out[o + 7] = (prev += (v >>> (7 * w)) & mask);
      }
    } else if (w <= 16) {
      int nG = n & ~7;
      for (; i < nG; i += 8) {
        int base = baseByte + ((i * w) >> 3);
        long lo = (long) LE.get(bytes, base);
        long hi = (long) LE.get(bytes, base + 8);
        int o = outOff + i;
        for (int j = 0; j < 8; j++) {
          int start = j * w; // up to 7*16=112: route by which word(s) hold it
          long v;
          if (start >= 64) v = hi >>> (start - 64);
          else {
            v = lo >>> start;
            if (start + w > 64) v |= hi << (64 - start);
          }
          out[o + j] = (prev += v & mask);
        }
      }
    }
    int bitPos = (baseByte << 3) + i * w;
    for (; i < n; i++) {
      prev += readBits(bytes, bitPos, w, mask);
      out[outOff + i] = prev;
      bitPos += w;
    }
    return prev;
  }
}
