package io.quiverspark;

import java.io.IOException;
import java.util.Arrays;

/**
 * Page decode kernels for the JVM scan — byte-compatible with the Python
 * decoder (quiver_spark/format/codecs.py, validity.py, roaring.py,
 * bitpack.py, patas.py) and the reference layouts
 * (/root/reference/src/compression/*): the full adaptive codec surface
 * (None/Lz4/Zstd/Snappy, OneValue, Freq with portable-roaring exception
 * positions, recursive Dict, RLE, BitPacker4x Bitpacking and
 * DeltaBitpacking, Patas) over flat leaves. Where the Python side uses
 * vectorized numpy formulations, these are the plain sequential loops —
 * the JVM JIT makes that the fast path.
 */
final class QuiverPageDecoder {
  static final int CODEC_NONE = 0, CODEC_LZ4 = 1, CODEC_ZSTD = 2, CODEC_SNAPPY = 3;
  static final int CODEC_RLE = 10, CODEC_DICT = 11, CODEC_ONE_VALUE = 12, CODEC_FREQ = 13;
  static final int CODEC_BITPACKING = 14, CODEC_DELTA_BITPACKING = 15, CODEC_PATAS = 16;

  private QuiverPageDecoder() {}

  /** Little-endian cursor over a page/payload. */
  static final class Cursor {
    final byte[] a;
    int pos;
    final int end;

    Cursor(byte[] a, int pos, int end) {
      this.a = a;
      this.pos = pos;
      this.end = end;
    }

    int u8() { return a[pos++] & 0xFF; }

    int u32() {
      int v = (a[pos] & 0xFF) | ((a[pos + 1] & 0xFF) << 8)
          | ((a[pos + 2] & 0xFF) << 16) | ((a[pos + 3] & 0xFF) << 24);
      pos += 4;
      return v;
    }

    long u64() {
      long v = 0;
      for (int i = 7; i >= 0; i--) v = (v << 8) | (a[pos + i] & 0xFF);
      pos += 8;
      return v;
    }

    byte[] take(int n) {
      byte[] out = Arrays.copyOfRange(a, pos, pos + n);
      pos += n;
      return out;
    }
  }

  static long leLong(byte[] a, int off, int width) {
    long v = 0;
    for (int i = width - 1; i >= 0; i--) v = (v << 8) | (a[off + i] & 0xFF);
    return v;
  }

  // ---- basic block codecs ------------------------------------------------

  static byte[] decompress(int codec, byte[] payload, int rawSize) throws IOException {
    switch (codec) {
      case CODEC_NONE:
        return payload.length == rawSize ? payload : Arrays.copyOf(payload, rawSize);
      case CODEC_ZSTD:
        return com.github.luben.zstd.Zstd.decompress(payload, rawSize);
      case CODEC_LZ4: {
        byte[] out = new byte[rawSize];
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
            .decompress(payload, 0, out, 0, rawSize);
        return out;
      }
      case CODEC_SNAPPY:
        return org.xerial.snappy.Snappy.uncompress(payload);
      default:
        throw new IOException("not a basic codec: " + codec);
    }
  }

  static boolean isBasic(int codec) {
    return codec <= CODEC_SNAPPY;
  }

  // ---- validity (Parquet hybrid-RLE def levels, bit width 1) -------------

  /** Parse `def_levels_len u32 | runs` from cur; returns null when all
   * valid (def_len==0), else boolean[length] (true = present). */
  static boolean[] readValidity(Cursor cur, int length) {
    int defLen = cur.u32();
    int end = cur.pos + defLen;
    if (defLen == 0) return null;
    boolean[] out = new boolean[length];
    Arrays.fill(out, true);
    int count = 0;
    int pos = cur.pos;
    byte[] a = cur.a;
    boolean anyNull = false;
    while (count < length && pos < end) {
      long header = 0;
      int shift = 0;
      while (true) {
        int b = a[pos++] & 0xFF;
        header |= (long) (b & 0x7F) << shift;
        if ((b & 0x80) == 0) break;
        shift += 7;
      }
      if ((header & 1) != 0) { // bitpacked groups of 8
        int groups = (int) (header >> 1);
        int take = Math.min(groups * 8, length - count);
        for (int i = 0; i < take; i++) {
          boolean v = ((a[pos + (i >> 3)] >> (i & 7)) & 1) != 0;
          out[count + i] = v;
          if (!v) anyNull = true;
        }
        count += take;
        pos += groups;
      } else { // RLE run of one level byte
        int run = (int) (header >> 1);
        boolean v = a[pos++] != 0;
        int take = Math.min(run, length - count);
        if (!v) {
          Arrays.fill(out, count, count + take, false);
          anyNull = true;
        }
        count += take;
      }
    }
    cur.pos = end;
    return anyNull ? out : null;
  }

  // ---- roaring (portable) ------------------------------------------------

  /** Portable roaring bytes → sorted positions. */
  static int[] roaringDeserialize(byte[] buf) throws IOException {
    Cursor c = new Cursor(buf, 0, buf.length);
    long cookie = c.u32() & 0xFFFFFFFFL;
    int nContainers;
    boolean[] runFlags = null;
    boolean hasOffsets;
    if (cookie == 12346L) {
      nContainers = c.u32();
      hasOffsets = true;
    } else if ((cookie & 0xFFFF) == 12347L) {
      nContainers = (int) (cookie >>> 16) + 1;
      int nFlagBytes = (nContainers + 7) / 8;
      runFlags = new boolean[nContainers];
      for (int i = 0; i < nContainers; i++) {
        runFlags[i] = ((buf[c.pos + (i >> 3)] >> (i & 7)) & 1) != 0;
      }
      c.pos += nFlagBytes;
      hasOffsets = nContainers >= 4;
    } else {
      throw new IOException("bad roaring cookie: " + cookie);
    }
    int[] keys = new int[nContainers];
    int[] cards = new int[nContainers];
    for (int i = 0; i < nContainers; i++) {
      keys[i] = (c.a[c.pos] & 0xFF) | ((c.a[c.pos + 1] & 0xFF) << 8);
      cards[i] = ((c.a[c.pos + 2] & 0xFF) | ((c.a[c.pos + 3] & 0xFF) << 8)) + 1;
      c.pos += 4;
    }
    if (hasOffsets) c.pos += 4 * nContainers; // containers follow in order
    int total = 0;
    for (int card : cards) total += card;
    int[] out = new int[total];
    int w = 0;
    for (int i = 0; i < nContainers; i++) {
      int base = keys[i] << 16;
      int card = cards[i];
      if (runFlags != null && runFlags[i]) {
        int nRuns = (c.a[c.pos] & 0xFF) | ((c.a[c.pos + 1] & 0xFF) << 8);
        c.pos += 2;
        for (int r = 0; r < nRuns; r++) {
          int start = (c.a[c.pos] & 0xFF) | ((c.a[c.pos + 1] & 0xFF) << 8);
          int len = ((c.a[c.pos + 2] & 0xFF) | ((c.a[c.pos + 3] & 0xFF) << 8)) + 1;
          c.pos += 4;
          for (int v = start; v < start + len; v++) out[w++] = base | v;
        }
      } else if (card <= 4096) {
        for (int v = 0; v < card; v++) {
          out[w++] = base | ((c.a[c.pos] & 0xFF) | ((c.a[c.pos + 1] & 0xFF) << 8));
          c.pos += 2;
        }
      } else {
        for (int byteI = 0; byteI < 8192; byteI++) {
          int b = c.a[c.pos + byteI] & 0xFF;
          while (b != 0) {
            int bit = Integer.numberOfTrailingZeros(b);
            out[w++] = base | (byteI * 8 + bit);
            b &= b - 1;
          }
        }
        c.pos += 8192;
      }
    }
    return w == total ? out : Arrays.copyOf(out, w);
  }

  // ---- BitPacker4x -------------------------------------------------------

  /** Unpack BitPacker4x blocks (u8 num_bits | num_bits*16 bytes each) into
   * `length` u32 values (stored in an int[]). */
  static int[] bitpackUnpack(byte[] buf, int off, int length) {
    int nBlocks = (length + 127) / 128;
    int[] out = new int[nBlocks * 128];
    int pos = off;
    for (int blk = 0; blk < nBlocks; blk++) {
      int b = buf[pos++] & 0xFF;
      if (b == 0) {
        pos += 0;
        continue; // values stay 0
      }
      // lanes: value v[w*4 + l]; lane l's 32 values packed LSB-first into
      // b u32 words; 128-bit word k interleaves lanes (lane l word k at
      // u32 index k*4 + l)
      for (int l = 0; l < 4; l++) {
        long acc = 0;
        int filled = 0;
        int wordIdx = 0;
        for (int w = 0; w < 32; w++) {
          while (filled < b) {
            int u32pos = pos + (wordIdx * 4 + l) * 4;
            long word = (buf[u32pos] & 0xFFL) | ((buf[u32pos + 1] & 0xFFL) << 8)
                | ((buf[u32pos + 2] & 0xFFL) << 16) | ((buf[u32pos + 3] & 0xFFL) << 24);
            acc |= word << filled;
            filled += 32;
            wordIdx++;
          }
          out[blk * 128 + w * 4 + l] = (int) (acc & ((b == 32) ? 0xFFFFFFFFL : ((1L << b) - 1)));
          acc >>>= b;
          filled -= b;
        }
      }
      pos += b * 16;
    }
    return out; // caller truncates to length
  }

  /** Delta flavor: per-lane word deltas; block's first word subtracts the
   * running initial (previous block's last raw value), u32 wraparound. */
  static int[] bitpackUnpackSorted(byte[] buf, int off, int length, int initial) {
    int[] deltas = bitpackUnpack(buf, off, length);
    int nBlocks = (length + 127) / 128;
    int init = initial;
    for (int blk = 0; blk < nBlocks; blk++) {
      int base = blk * 128;
      for (int l = 0; l < 4; l++) {
        deltas[base + l] += init; // word 0, lane l
      }
      for (int w = 1; w < 32; w++) {
        for (int l = 0; l < 4; l++) {
          deltas[base + w * 4 + l] += deltas[base + (w - 1) * 4 + l];
        }
      }
      init = deltas[base + 127]; // block's last raw value
    }
    return deltas;
  }

  // ---- patas -------------------------------------------------------------

  /** Patas decode → u64 bit patterns (low `width*8` bits meaningful). */
  static long[] patasDecode(byte[] buf, int off, int end, int length, int width) {
    long[] out = new long[length];
    if (length == 0) return out;
    long v0 = leLong(buf, off, width);
    out[0] = v0;
    int nbits = width * 8;
    int pos = off + width;
    for (int i = 1; i < length; i++) {
      int hdr = (buf[pos] & 0xFF) | ((buf[pos + 1] & 0xFF) << 8);
      pos += 2;
      int tz = hdr & 0x3F;
      int sig = (hdr >> 6) & 7;
      int diff = (hdr >> 9) & 0x7F;
      if (diff == 0) {
        throw new IllegalStateException("corrupt patas page: ref_diff=0");
      }
      if (sig == 0 && width == 8 && tz < 63) sig = 8;
      long stored = 0;
      for (int k = 0; k < sig; k++) {
        stored |= (buf[pos + k] & 0xFFL) << (8 * k);
      }
      pos += sig;
      long xor = (sig == 0 && tz == nbits - 1) ? 0 : (stored << tz);
      out[i] = xor ^ out[i - diff];
    }
    return out;
  }

  // ---- generic fixed-width value decode (numeric + decimal cascade) ------

  /**
   * Decode one values frame into a raw little-endian byte[] of
   * length*width bytes. Covers decode_numeric (width 1/2/4/8) and
   * decode_fixed (width 16/32) — the layouts are identical; Bitpacking /
   * DeltaBitpacking / Patas only ever appear at widths 4/8.
   */
  static byte[] decodeValues(Cursor cur, int length, int width) throws IOException {
    int codec = cur.u8();
    int csize = cur.u32();
    int usize = cur.u32();
    byte[] payload = cur.take(csize);

    if (isBasic(codec)) {
      return decompress(codec, payload, length * width);
    }
    byte[] out;
    switch (codec) {
      case CODEC_ONE_VALUE: {
        out = new byte[length * width];
        for (int i = 0; i < length; i++) {
          System.arraycopy(payload, 0, out, i * width, width);
        }
        return out;
      }
      case CODEC_RLE: {
        out = new byte[length * width];
        int rec = 4 + width;
        int pos = 0;
        int covered = 0;
        while (covered < length && pos + rec <= payload.length) {
          long count = (payload[pos] & 0xFFL) | ((payload[pos + 1] & 0xFFL) << 8)
              | ((payload[pos + 2] & 0xFFL) << 16) | ((payload[pos + 3] & 0xFFL) << 24);
          int take = (int) Math.min(count, length - covered);
          for (int i = 0; i < take; i++) {
            System.arraycopy(payload, pos + 4, out, (covered + i) * width, width);
          }
          covered += take;
          pos += rec;
        }
        return out;
      }
      case CODEC_DICT: {
        Cursor sub = new Cursor(payload, 0, payload.length);
        byte[] idxRaw = decodeValues(sub, length, 4);
        int nSets = sub.u32();
        byte[] dict = sub.take(nSets * width);
        out = new byte[length * width];
        for (int i = 0; i < length; i++) {
          int idx = (int) leLong(idxRaw, i * 4, 4);
          System.arraycopy(dict, idx * width, out, i * width, width);
        }
        return out;
      }
      case CODEC_FREQ: {
        Cursor sub = new Cursor(payload, 0, payload.length);
        byte[] top = sub.take(width);
        int bmSize = sub.u32();
        int[] positions = roaringDeserialize(sub.take(bmSize));
        byte[] exc = decodeValues(sub, positions.length, width);
        out = new byte[length * width];
        for (int i = 0; i < length; i++) {
          System.arraycopy(top, 0, out, i * width, width);
        }
        for (int p = 0; p < positions.length; p++) {
          System.arraycopy(exc, p * width, out, positions[p] * width, width);
        }
        return out;
      }
      case CODEC_BITPACKING: {
        int[] vals = bitpackUnpack(payload, 0, length);
        return u32ToLe(vals, length, width);
      }
      case CODEC_DELTA_BITPACKING: {
        int[] vals = bitpackUnpackSorted(payload, 0, length, 0);
        return u32ToLe(vals, length, width);
      }
      case CODEC_PATAS: {
        long[] vals = patasDecode(payload, 0, payload.length, length, width);
        out = new byte[length * width];
        for (int i = 0; i < length; i++) {
          long v = vals[i];
          for (int k = 0; k < width; k++) {
            out[i * width + k] = (byte) (v >>> (8 * k));
          }
        }
        return out;
      }
      default:
        throw new IOException("unknown codec byte " + codec);
    }
  }

  private static byte[] u32ToLe(int[] vals, int length, int width) throws IOException {
    // Bitpacking families only fire on 4-byte ints (reference bp.rs:92-100)
    if (width != 4) throw new IOException("bitpacked page at width " + width);
    byte[] out = new byte[length * 4];
    for (int i = 0; i < length; i++) {
      int v = vals[i];
      out[i * 4] = (byte) v;
      out[i * 4 + 1] = (byte) (v >>> 8);
      out[i * 4 + 2] = (byte) (v >>> 16);
      out[i * 4 + 3] = (byte) (v >>> 24);
    }
    return out;
  }

  // ---- binary ------------------------------------------------------------

  static final class Binary {
    final long[] offsets; // length+1, rebased to 0
    final byte[] values;

    Binary(long[] offsets, byte[] values) {
      this.offsets = offsets;
      this.values = values;
    }
  }

  static Binary decodeBinary(Cursor cur, int length, int offsetWidth) throws IOException {
    int codec = cur.u8();
    int csize = cur.u32();
    int usize = cur.u32();

    if (isBasic(codec)) {
      byte[] rawOff = decompress(codec, cur.take(csize), (length + 1) * offsetWidth);
      long[] offsets = new long[length + 1];
      for (int i = 0; i <= length; i++) {
        offsets[i] = leLong(rawOff, i * offsetWidth, offsetWidth);
      }
      int codec2 = cur.u8();
      int csize2 = cur.u32();
      int usize2 = cur.u32();
      byte[] values = decompress(codec2, cur.take(csize2), usize2);
      long base = offsets[0];
      for (int i = 0; i <= length; i++) offsets[i] -= base;
      return new Binary(offsets, values);
    }

    byte[] payload = cur.take(csize);
    Cursor sub = new Cursor(payload, 0, payload.length);
    switch (codec) {
      case CODEC_ONE_VALUE: {
        int vlen = sub.u32();
        byte[] val = sub.take(vlen);
        long[] offsets = new long[length + 1];
        byte[] values = new byte[vlen * length];
        for (int i = 0; i < length; i++) {
          offsets[i + 1] = (long) (i + 1) * vlen;
          System.arraycopy(val, 0, values, i * vlen, vlen);
        }
        return new Binary(offsets, values);
      }
      case CODEC_FREQ: {
        long topLen = sub.u64();
        byte[] top = sub.take((int) topLen);
        int bmSize = sub.u32();
        int[] positions = roaringDeserialize(sub.take(bmSize));
        byte[][] exc = new byte[positions.length][];
        for (int i = 0; i < positions.length; i++) {
          exc[i] = sub.take((int) sub.u64());
        }
        long[] lens = new long[length];
        Arrays.fill(lens, topLen);
        for (int i = 0; i < positions.length; i++) lens[positions[i]] = exc[i].length;
        long[] offsets = new long[length + 1];
        for (int i = 0; i < length; i++) offsets[i + 1] = offsets[i] + lens[i];
        byte[] values = new byte[(int) offsets[length]];
        int nextExc = 0;
        for (int i = 0; i < length; i++) {
          byte[] chunk =
              (nextExc < positions.length && positions[nextExc] == i) ? exc[nextExc++] : top;
          System.arraycopy(chunk, 0, values, (int) offsets[i], chunk.length);
        }
        return new Binary(offsets, values);
      }
      case CODEC_DICT: {
        byte[] idxRaw = decodeValues(sub, length, 4);
        int nSets = sub.u32();
        byte[][] entries = new byte[nSets][];
        for (int i = 0; i < nSets; i++) {
          entries[i] = sub.take((int) sub.u64());
        }
        long[] offsets = new long[length + 1];
        for (int i = 0; i < length; i++) {
          int idx = (int) leLong(idxRaw, i * 4, 4);
          offsets[i + 1] = offsets[i] + entries[idx].length;
        }
        byte[] values = new byte[(int) offsets[length]];
        for (int i = 0; i < length; i++) {
          int idx = (int) leLong(idxRaw, i * 4, 4);
          System.arraycopy(entries[idx], 0, values, (int) offsets[i], entries[idx].length);
        }
        return new Binary(offsets, values);
      }
      default:
        throw new IOException("binary codec " + codec);
    }
  }

  // ---- boolean -----------------------------------------------------------

  static boolean[] decodeBoolean(Cursor cur, int length) throws IOException {
    int codec = cur.u8();
    int csize = cur.u32();
    int usize = cur.u32(); // = value count for booleans (codecs.py:546)
    byte[] payload = cur.take(csize);
    boolean[] out = new boolean[length];
    if (isBasic(codec)) {
      byte[] raw = decompress(codec, payload, (length + 7) / 8);
      for (int i = 0; i < length; i++) {
        out[i] = ((raw[i >> 3] >> (i & 7)) & 1) != 0;
      }
      return out;
    }
    if (codec == CODEC_ONE_VALUE) {
      Arrays.fill(out, payload[0] != 0);
      return out;
    }
    if (codec == CODEC_RLE) {
      int pos = 0;
      int covered = 0;
      while (covered < length && pos + 5 <= payload.length) {
        long count = (payload[pos] & 0xFFL) | ((payload[pos + 1] & 0xFFL) << 8)
            | ((payload[pos + 2] & 0xFFL) << 16) | ((payload[pos + 3] & 0xFFL) << 24);
        boolean v = payload[pos + 4] != 0;
        int take = (int) Math.min(count, length - covered);
        if (v) Arrays.fill(out, covered, covered + take, true);
        covered += take;
        pos += 5;
      }
      return out;
    }
    throw new IOException("boolean codec " + codec);
  }
}
