package io.quiverspark;

import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.math.BigInteger;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.ArrayList;
import java.util.List;

import org.apache.arrow.vector.ipc.message.MessageSerializer;
import org.apache.arrow.vector.types.DateUnit;
import org.apache.arrow.vector.types.FloatingPointPrecision;
import org.apache.arrow.vector.types.TimeUnit;
import org.apache.arrow.vector.types.pojo.ArrowType;
import org.apache.arrow.vector.types.pojo.Field;
import org.apache.arrow.vector.types.pojo.FieldType;
import org.apache.arrow.vector.types.pojo.Schema;
import org.apache.spark.sql.types.ByteType;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.BinaryType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DateType;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.IntegerType;
import org.apache.spark.sql.types.LongType;
import org.apache.spark.sql.types.ShortType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;

/**
 * Assembles one quiver file from columnar buffers, byte-compatible with the
 * Python writer (quiver_spark/format/writer.py) in basic-codec mode and with
 * the reference envelope (reference src/write/writer.rs:91-167):
 *
 *   ARROW2\0\0 | per-leaf contiguous pages | schema IPC flatbuffer |
 *   meta block | schema_size u32 | meta_size u32 | EOS
 *
 * Page layouts (reference README.md:28-76):
 *   non-nullable: codec u8 | csize u32 | usize u32 | payload
 *   nullable:     def_levels_len u32 | hybrid-RLE bitpacked bits | frame
 *   binary:       two frames back-to-back (offsets rebased to 0, then values)
 *   boolean:      frame over the little-endian packed bitmap, usize = n
 *
 * Scope: FLAT schemas only (the JVM fast-ingest path); nested columns
 * stay on the Python writer, which remains the compaction/rewrite path.
 * Since round 11 the ENCODER is adaptive too — the COMPLETE typed
 * cascade: OneValue / RLE / Dict (recursive u32 code frames) /
 * Bitpacking / DeltaBitpacking / Freq (majority value + roaring
 * exceptions) / Patas (sampled-ratio entry, the reference's
 * compress_sample_ratio posture), chosen per page from single-pass
 * stats with the Python chooser's eligibility rules (compress_ratio
 * threshold 2.0, `forbidden` csv for forced-codec matrices), bringing
 * JVM-ingested storage to parity with the Python adaptive writer
 * (sf0.1 lineitem: 11.75 vs 11.95 MB).
 */
public final class QuiverFileEncoder {
  public static final byte[] MAGIC = {'A', 'R', 'R', 'O', 'W', '2', 0, 0};
  public static final byte[] EOS = {(byte) 0xFF, (byte) 0xFF, (byte) 0xFF, (byte) 0xFF, 0, 0, 0, 0};

  public static final int CODEC_NONE = 0;
  public static final int CODEC_LZ4 = 1;
  public static final int CODEC_ZSTD = 2;
  public static final int CODEC_SNAPPY = 3;

  private QuiverFileEncoder() {}

  // ---- column buffers -------------------------------------------------

  /** Growable little-endian byte buffer. */
  static final class LeBuf {
    byte[] a = new byte[1 << 16];
    int len = 0;

    void ensure(int extra) {
      if (len + extra > a.length) {
        int want = Math.max(a.length * 2, len + extra);
        byte[] b = new byte[want];
        System.arraycopy(a, 0, b, 0, len);
        a = b;
      }
    }

    void putByte(int v) { ensure(1); a[len++] = (byte) v; }

    void putShort(short v) {
      ensure(2);
      a[len++] = (byte) v;
      a[len++] = (byte) (v >>> 8);
    }

    void putInt(int v) {
      ensure(4);
      a[len++] = (byte) v;
      a[len++] = (byte) (v >>> 8);
      a[len++] = (byte) (v >>> 16);
      a[len++] = (byte) (v >>> 24);
    }

    void putLong(long v) {
      ensure(8);
      for (int i = 0; i < 8; i++) { a[len++] = (byte) v; v >>>= 8; }
    }

    void putBytes(byte[] src, int off, int n) {
      ensure(n);
      System.arraycopy(src, off, a, len, n);
      len += n;
    }
  }

  /** One flat column being accumulated. */
  public static final class ColBuf {
    final DataType type;
    final boolean nullable;
    final int width;          // fixed byte width; -1 for string/binary; 0 for bool
    final boolean isBool;
    final boolean isVarlen;
    final int decPrecision, decScale;
    final LeBuf values = new LeBuf();
    int[] offsets;            // varlen only: n+1 cumulative byte offsets
    boolean[] valid;          // lazily allocated on first null
    boolean[] bools;          // bool only
    int n = 0;
    int nullCount = 0;

    ColBuf(StructField f) {
      this.type = f.dataType();
      this.nullable = f.nullable();
      DataType t = f.dataType();
      if (t instanceof StringType || t instanceof BinaryType) {
        width = -1; isBool = false; isVarlen = true;
        offsets = new int[1 << 12];
        offsets[0] = 0;
      } else if (t instanceof BooleanType) {
        width = 0; isBool = true; isVarlen = false;
        bools = new boolean[1 << 12];
      } else if (t instanceof DecimalType) {
        width = 16; isBool = false; isVarlen = false;
      } else if (t instanceof LongType || t instanceof DoubleType
          || t instanceof TimestampType || t instanceof TimestampNTZType) {
        width = 8; isBool = false; isVarlen = false;
      } else if (t instanceof IntegerType || t instanceof DateType || t instanceof FloatType) {
        width = 4; isBool = false; isVarlen = false;
      } else if (t instanceof ShortType) {
        width = 2; isBool = false; isVarlen = false;
      } else if (t instanceof ByteType) {
        width = 1; isBool = false; isVarlen = false;
      } else {
        throw new UnsupportedOperationException(
            "quiverjvm writer supports flat primitive/string/decimal columns; got " + t);
      }
      if (t instanceof DecimalType) {
        decPrecision = ((DecimalType) t).precision();
        decScale = ((DecimalType) t).scale();
      } else {
        decPrecision = 0; decScale = 0;
      }
    }

    void markValidity(boolean isNull) {
      if (isNull && valid == null) {
        valid = new boolean[Math.max(n + 1, 1 << 12)];
        java.util.Arrays.fill(valid, 0, n, true);
      }
      if (valid != null) {
        if (n >= valid.length) {
          boolean[] b = new boolean[valid.length * 2];
          System.arraycopy(valid, 0, b, 0, valid.length);
          valid = b;
        }
        valid[n] = !isNull;
      }
      if (isNull) nullCount++;
    }

    void addNull() {
      markValidity(true);
      if (isVarlen) pushOffset(0);
      else if (isBool) pushBool(false);
      else { values.ensure(width); for (int i = 0; i < width; i++) values.a[values.len++] = 0; }
      n++;
    }

    private void pushOffset(int extra) {
      if (n + 1 >= offsets.length) {
        int[] b = new int[offsets.length * 2];
        System.arraycopy(offsets, 0, b, 0, offsets.length);
        offsets = b;
      }
      offsets[n + 1] = offsets[n] + extra;
    }

    private void pushBool(boolean v) {
      if (n >= bools.length) {
        boolean[] b = new boolean[bools.length * 2];
        System.arraycopy(bools, 0, b, 0, bools.length);
        bools = b;
      }
      bools[n] = v;
    }

    void addLong(long v) { markValidity(false); values.putLong(v); n++; }
    void addInt(int v) { markValidity(false); values.putInt(v); n++; }
    void addShort(short v) { markValidity(false); values.putShort(v); n++; }
    void addByteVal(byte v) { markValidity(false); values.putByte(v); n++; }
    void addDouble(double v) { markValidity(false); values.putLong(Double.doubleToRawLongBits(v)); n++; }
    void addFloat(float v) { markValidity(false); values.putInt(Float.floatToRawIntBits(v)); n++; }
    void addBool(boolean v) { markValidity(false); pushBool(v); n++; }

    void addBytes(byte[] b) {
      markValidity(false);
      pushOffset(b.length);
      values.putBytes(b, 0, b.length);
      n++;
    }

    void addDecimal(BigInteger unscaled) {
      markValidity(false);
      byte[] be = unscaled.toByteArray(); // big-endian two's complement
      values.ensure(16);
      byte pad = (byte) (unscaled.signum() < 0 ? 0xFF : 0x00);
      // little-endian 16-byte: reverse the BE bytes, then sign-extend
      for (int i = be.length - 1; i >= 0; i--) values.a[values.len++] = be[i];
      for (int i = be.length; i < 16; i++) values.a[values.len++] = pad;
      n++;
    }

    void reset() {
      values.len = 0;
      n = 0;
      nullCount = 0;
      valid = null;
      if (offsets != null) offsets[0] = 0;
    }
  }

  // ---- validity (Parquet hybrid-RLE, one bitpacked run) ----------------

  static byte[] uleb128(long v) {
    ByteArrayOutputStream out = new ByteArrayOutputStream(5);
    while (true) {
      int b = (int) (v & 0x7F);
      v >>>= 7;
      if (v != 0) out.write(b | 0x80);
      else { out.write(b); break; }
    }
    return out.toByteArray();
  }

  /** def-levels for rows [start, start+len): uleb128((groups<<1)|1) + packed bits. */
  static byte[] validityBytes(ColBuf col, int start, int len) {
    int groups = (len + 7) / 8;
    byte[] header = uleb128(((long) groups << 1) | 1);
    byte[] bits = new byte[groups];
    for (int i = 0; i < len; i++) {
      boolean v = col.valid == null || col.valid[start + i];
      if (v) bits[i >> 3] |= (1 << (i & 7)); // little-endian bit order
    }
    byte[] out = new byte[header.length + bits.length];
    System.arraycopy(header, 0, out, 0, header.length);
    System.arraycopy(bits, 0, out, header.length, bits.length);
    return out;
  }

  // ---- frames ----------------------------------------------------------

  static byte[] compress(int codec, byte[] raw, int off, int len) {
    if (codec == CODEC_NONE) {
      byte[] out = new byte[len];
      System.arraycopy(raw, off, out, 0, len);
      return out;
    }
    byte[] slice = new byte[len];
    System.arraycopy(raw, off, slice, 0, len);
    if (codec == CODEC_ZSTD) {
      return com.github.luben.zstd.Zstd.compress(slice, 3);
    }
    if (codec == CODEC_SNAPPY) {
      try {
        return org.xerial.snappy.Snappy.compress(slice);
      } catch (java.io.IOException e) {
        throw new RuntimeException(e);
      }
    }
    // lz4 raw block (pyarrow "lz4_raw")
    net.jpountz.lz4.LZ4Compressor c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor();
    return c.compress(slice);
  }

  static void frame(LeBuf out, int codec, byte[] payload, int usize) {
    out.putByte(codec);
    out.putInt(payload.length);
    out.putInt(usize);
    out.putBytes(payload, 0, payload.length);
  }

  /** Bitmask of forbidden typed codecs (WriteOptions.forbidden parity):
   * bit (codec-10) set = codec excluded from the chooser. */
  static int forbidMask(String csv) {
    int m = 0;
    for (String c : csv.split(",")) {
      switch (c.trim()) {
        case "rle": m |= 1 << (QuiverPageDecoder.CODEC_RLE - 10); break;
        case "dict": m |= 1 << (QuiverPageDecoder.CODEC_DICT - 10); break;
        case "one_value": m |= 1 << (QuiverPageDecoder.CODEC_ONE_VALUE - 10); break;
        case "freq": m |= 1 << (QuiverPageDecoder.CODEC_FREQ - 10); break;
        case "bitpacking": m |= 1 << (QuiverPageDecoder.CODEC_BITPACKING - 10); break;
        case "delta_bitpacking": m |= 1 << (QuiverPageDecoder.CODEC_DELTA_BITPACKING - 10); break;
        case "patas": m |= 1 << (QuiverPageDecoder.CODEC_PATAS - 10); break;
        default: break; // unknown/empty: ignore (Python accepts any names)
      }
    }
    return m;
  }

  static boolean allowed(int forbid, int codecId) {
    return (forbid & (1 << (codecId - 10))) == 0;
  }

  /** Encode one page of a column into `out`.
   *
   * Adaptive typed codecs (the chooser's cheap wins, mirroring the
   * Python cascade's eligibility rules — format/codecs.py
   * encode_numeric/encode_binary/encode_boolean, reference
   * src/compression/integer/mod.rs:231-308): OneValue, RLE and Dict are
   * considered per page from single-pass stats (runs; uniques with an
   * early bail once dict is ineligible) and chosen when the estimated
   * ratio clears ``adaptiveRatio`` (Python WriteOptions.compress_ratio
   * default 2.0; ≤0 disables → basic block codec only). Nulls occupy
   * zeroed slots in the buffers, so the chooser sees them as ordinary
   * values — strictly conservative vs the Python writer's forward-fill
   * (fewer typed hits, never a wrong decode: validity masks those slots).
   * Freq/Bitpacking/Delta/Patas stay Python-writer-only; the JVM READER
   * decodes all of them. */
  static void encodePage(LeBuf out, ColBuf col, int start, int len, int codec,
      double adaptiveRatio, int forbid) {
    if (col.nullable) {
      byte[] v = validityBytes(col, start, len);
      out.putInt(v.length);
      out.putBytes(v, 0, v.length);
    }
    if (col.isBool) {
      encodeBoolPage(out, col, start, len, codec, adaptiveRatio, forbid);
    } else if (col.isVarlen) {
      encodeBinaryPage(out, col, start, len, codec, adaptiveRatio, forbid);
    } else {
      encodeFixedPage(out, col, start, len, codec, adaptiveRatio, forbid);
    }
  }


  // ---- BitPacker4x pack (inverse of QuiverPageDecoder.bitpackUnpack:
  // per 128-value block: 1-byte num_bits, then 4 interleaved lanes of 32
  // values packed LSB-first into num_bits u32 words each) ----------------

  static byte[] bitpackPack(int[] vals) {
    int nBlocks = vals.length / 128;
    LeBuf out = new LeBuf();
    for (int blk = 0; blk < nBlocks; blk++) {
      long maxU = 0;
      for (int i = 0; i < 128; i++) {
        long v = vals[blk * 128 + i] & 0xFFFFFFFFL;
        if (v > maxU) maxU = v;
      }
      int b = 64 - Long.numberOfLeadingZeros(maxU);
      out.putByte(b);
      if (b == 0) continue;
      byte[] block = new byte[b * 16];
      for (int l = 0; l < 4; l++) {
        long acc = 0;
        int filled = 0;
        int wordIdx = 0;
        for (int w = 0; w < 32; w++) {
          long v = vals[blk * 128 + w * 4 + l] & 0xFFFFFFFFL;
          acc |= v << filled;
          filled += b;
          while (filled >= 32) {
            int p = (wordIdx * 4 + l) * 4;
            block[p] = (byte) acc;
            block[p + 1] = (byte) (acc >>> 8);
            block[p + 2] = (byte) (acc >>> 16);
            block[p + 3] = (byte) (acc >>> 24);
            acc >>>= 32;
            filled -= 32;
            wordIdx++;
          }
        }
      }
      out.putBytes(block, 0, block.length);
    }
    byte[] payload = new byte[out.len];
    System.arraycopy(out.a, 0, payload, 0, out.len);
    return payload;
  }

  /** Lane-structured deltas, the inverse of
   * QuiverPageDecoder.bitpackUnpackSorted (value index w*4+l; block's
   * first word subtracts the previous block's last raw value). Only
   * called for ascending sequences, where every delta is non-negative. */
  static int[] sortedDeltas(int[] vals) {
    int nBlocks = vals.length / 128;
    int[] d = new int[vals.length];
    int init = 0;
    for (int blk = 0; blk < nBlocks; blk++) {
      int base = blk * 128;
      for (int l = 0; l < 4; l++) {
        d[base + l] = vals[base + l] - init;
      }
      for (int w = 1; w < 32; w++) {
        for (int l = 0; l < 4; l++) {
          d[base + w * 4 + l] = vals[base + w * 4 + l] - vals[base + (w - 1) * 4 + l];
        }
      }
      init = vals[base + 127];
    }
    return d;
  }

  static long bitpackSize(int[] vals) {
    int nBlocks = vals.length / 128;
    long size = 0;
    for (int blk = 0; blk < nBlocks; blk++) {
      long maxU = 0;
      for (int i = 0; i < 128; i++) {
        long v = vals[blk * 128 + i] & 0xFFFFFFFFL;
        if (v > maxU) maxU = v;
      }
      size += 1 + 16L * (64 - Long.numberOfLeadingZeros(maxU));
    }
    return size;
  }


  // ---- patas (DuckDB XOR-with-reference float compression; byte-
  // compatible with format/patas.py and reference patas.rs) --------------

  /** Encode float bit patterns: value 0 raw LE, then per value a u16
   * header pack(ref_diff:7 | sig_bytes:3 | trailing_zeros:6) + the
   * significant bytes of xor >> tz. Reference = most recent identical
   * bit pattern (else index 0), demoted to i-1 when >127 back. */
  static byte[] patasEncode(long[] bits, int nbytes) {
    int n = bits.length;
    if (n == 0) return new byte[0];
    int nbits = nbytes * 8;
    LeBuf out = new LeBuf();
    for (int k = 0; k < nbytes; k++) out.putByte((int) (bits[0] >>> (8 * k)));
    java.util.HashMap<Long, Integer> last = new java.util.HashMap<>();
    last.put(bits[0], 0);
    for (int i = 1; i < n; i++) {
      Integer prev = last.get(bits[i]);
      int ref = prev == null ? 0 : prev;
      if (i - ref >= 128) ref = i - 1;
      long xor = bits[i] ^ bits[ref];
      long diff = i - ref;
      int tz;
      int sigBytes;
      long shifted;
      long tzStored;
      if (xor == 0) {
        sigBytes = 0;
        shifted = 0;
        tzStored = nbits - 1;
      } else {
        tz = Long.numberOfTrailingZeros(xor);
        shifted = xor >>> tz;
        sigBytes = (64 - Long.numberOfLeadingZeros(shifted) + 7) / 8;
        tzStored = tz;
      }
      int packed = (int) (((diff & 0x7F) << 9)
          | ((sigBytes & 7) << 6)
          | (tzStored & 0x3F));
      out.putByte(packed & 0xFF);
      out.putByte((packed >>> 8) & 0xFF);
      for (int k = 0; k < sigBytes; k++) out.putByte((int) (shifted >>> (8 * k)));
      last.put(bits[i], i);
    }
    byte[] payload = new byte[out.len];
    System.arraycopy(out.a, 0, payload, 0, out.len);
    return payload;
  }

  /** Estimated ratio from 10 evenly-spaced 64-value sample runs (the
   * reference's compress_sample_ratio; patas.py sample_ratio parity). */
  static double patasSampleRatio(long[] bits, int nbytes) {
    int n = bits.length;
    if (n == 0) return 0.0;
    long[] sample;
    if (n <= 640) {
      sample = bits;
    } else {
      int step = n / 10;
      long[] tmp = new long[640];
      int w = 0;
      for (int i = 0; i < 10; i++) {
        for (int j = 0; j < 64 && i * step + j < n; j++) {
          tmp[w++] = bits[i * step + j];
        }
      }
      sample = java.util.Arrays.copyOf(tmp, w);
    }
    long raw = (long) sample.length * nbytes;
    int comp = patasEncode(sample, nbytes).length;
    return raw / (double) Math.max(comp, 1);
  }

  /** Encode a u32 value stream (dict codes) as its own frame: OneValue /
   * RLE / Bitpacking candidates (the Python writer's recursive cascade on
   * dict indices), basic block codec fallback. */
  private static void encodeU32Frame(LeBuf out, int[] vals, int codec, double thr) {
    int len = vals.length;
    long total = (long) len * 4;
    if (thr > 0 && len > 0) {
      int runs = 1;
      for (int i = 1; i < len; i++) {
        if (vals[i] != vals[i - 1]) runs++;
      }
      if (runs == 1 && len >= thr) {
        byte[] val = {(byte) vals[0], (byte) (vals[0] >>> 8),
            (byte) (vals[0] >>> 16), (byte) (vals[0] >>> 24)};
        frame(out, QuiverPageDecoder.CODEC_ONE_VALUE, val, (int) total);
        return;
      }
      double rleRatio = total / (double) Math.max(runs * 8, 1);
      double bpRatio = 0;
      if (len % 128 == 0) {
        bpRatio = total / (double) Math.max(bitpackSize(vals), 1);
      }
      if (bpRatio >= thr && bpRatio >= rleRatio) {
        frame(out, QuiverPageDecoder.CODEC_BITPACKING, bitpackPack(vals), (int) total);
        return;
      }
      if (rleRatio >= thr) {
        LeBuf p = new LeBuf();
        int i = 0;
        while (i < len) {
          int j = i + 1;
          while (j < len && vals[j] == vals[i]) j++;
          p.putInt(j - i);
          p.putInt(vals[i]);
          i = j;
        }
        byte[] payload = new byte[p.len];
        System.arraycopy(p.a, 0, payload, 0, p.len);
        frame(out, QuiverPageDecoder.CODEC_RLE, payload, (int) total);
        return;
      }
    }
    byte[] raw = new byte[len * 4];
    ByteBuffer bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN);
    for (int v : vals) bb.putInt(v);
    frame(out, codec, compress(codec, raw, 0, raw.length), raw.length);
  }


  /** Portable-roaring bytes for sorted positions, all < 65536 (exception
   * positions inside one ≤8192-row page): cookie 12346, ONE array
   * container — the minimal valid form both deserializers accept. */
  static byte[] roaringSerialize(int[] positions) {
    LeBuf b = new LeBuf();
    b.putInt(12346);           // SERIAL_COOKIE_NO_RUNCONTAINER
    b.putInt(1);               // container count
    b.putShort((short) 0);     // key
    b.putShort((short) (positions.length - 1)); // cardinality - 1
    b.putInt(16);              // offset of the single container
    for (int p : positions) b.putShort((short) p);
    byte[] out = new byte[b.len];
    System.arraycopy(b.a, 0, out, 0, b.len);
    return out;
  }


  /** slot-vs-slot equality for a varlen ColBuf (absolute slot indexes). */
  private static boolean binEq(ColBuf col, int i, int j) {
    int li = col.offsets[i + 1] - col.offsets[i];
    int lj = col.offsets[j + 1] - col.offsets[j];
    if (li != lj) return false;
    return rangeEq(col.values.a, col.offsets[i], col.offsets[j], li);
  }

  private static boolean rangeEq(byte[] a, int p, int q, int w) {
    for (int k = 0; k < w; k++) {
      if (a[p + k] != a[q + k]) return false;
    }
    return true;
  }

  static void encodeFixedPage(LeBuf out, ColBuf col, int start, int len, int codec,
      double thr, int forbid) {
    int w = col.width;
    byte[] a = col.values.a;
    int base = start * w;
    long total = (long) len * w;
    if (thr > 0 && len > 0) {
      int runs = 1;
      for (int i = 1; i < len; i++) {
        if (!rangeEq(a, base + (i - 1) * w, base + i * w, w)) runs++;
      }
      if (runs == 1 && len >= thr
          && allowed(forbid, QuiverPageDecoder.CODEC_ONE_VALUE)) {
        // OneValue: payload is the single value
        byte[] val = new byte[w];
        System.arraycopy(a, base, val, 0, w);
        frame(out, QuiverPageDecoder.CODEC_ONE_VALUE, val, (int) total);
        return;
      }
      // One unique-value census serves BOTH dict and freq: freq needs a
      // >=90% top value, which forces uniq <= 0.1n+1 < n/3 — so whenever
      // the census bails at the dict threshold, freq is ineligible too
      // (no separate majority pass; the freq rules are codecs.py's:
      // integral types additionally need max >= 256, doubles/floats
      // qualify on share alone).
      int uniq = -1;
      java.util.LinkedHashMap<Long, int[]> census = null; // value -> {firstIdx, count}
      if (w <= 8 && (allowed(forbid, QuiverPageDecoder.CODEC_DICT)
          || allowed(forbid, QuiverPageDecoder.CODEC_FREQ))) {
        census = new java.util.LinkedHashMap<>();
        for (int i = 0; i < len; i++) {
          long key = 0;
          for (int k = w - 1; k >= 0; k--) key = (key << 8) | (a[base + i * w + k] & 0xFFL);
          int[] st = census.get(key);
          if (st == null) {
            census.put(key, new int[] {i, 1});
            if (census.size() * 3 >= len) { census = null; break; }
          } else {
            st[1]++;
          }
        }
        if (census != null) uniq = census.size();
      }
      if (census != null && len >= thr && allowed(forbid, QuiverPageDecoder.CODEC_FREQ)) {
        int topIdx = -1;
        int topCount = 0;
        for (int[] st : census.values()) {
          if (st[1] > topCount) { topCount = st[1]; topIdx = st[0]; }
        }
        boolean isFp = col.type instanceof DoubleType || col.type instanceof FloatType;
        int nExc = len - topCount;
        if (topCount >= 0.9 * len && nExc > 0 && nExc <= 4096) {
          boolean domainOk = isFp;
          if (!domainOk) {
            long maxU = 0;
            for (long key : census.keySet()) {
              if (Long.compareUnsigned(key, maxU) > 0) maxU = key;
            }
            domainOk = Long.compareUnsigned(maxU, 256L) >= 0;
          }
          if (domainOk) {
            int topOff = base + topIdx * w;
            int[] pos = new int[nExc];
            byte[] exc = new byte[nExc * w];
            int e = 0;
            for (int i = 0; i < len; i++) {
              int off = base + i * w;
              if (!rangeEq(a, topOff, off, w)) {
                pos[e] = i;
                System.arraycopy(a, off, exc, e * w, w);
                e++;
              }
            }
            byte[] bm = roaringSerialize(pos);
            LeBuf p = new LeBuf();
            p.putBytes(a, topOff, w);
            p.putInt(bm.length);
            p.putBytes(bm, 0, bm.length);
            frame(p, codec, compress(codec, exc, 0, exc.length), exc.length);
            byte[] payload = new byte[p.len];
            System.arraycopy(p.a, 0, payload, 0, p.len);
            frame(out, QuiverPageDecoder.CODEC_FREQ, payload, (int) total);
            return;
          }
        }
      }
      java.util.LinkedHashMap<Long, Integer> dict = null;
      if (census != null && allowed(forbid, QuiverPageDecoder.CODEC_DICT)) {
        dict = new java.util.LinkedHashMap<>();
        for (java.util.Map.Entry<Long, int[]> e : census.entrySet()) {
          dict.put(e.getKey(), dict.size());
        }
      } else {
        uniq = -1;
      }
      double rleRatio = allowed(forbid, QuiverPageDecoder.CODEC_RLE)
          ? total / (double) Math.max(runs * (4 + w), 1) : 0;
      double dictRatio = 0;
      if (uniq > 0) {
        int bitsNeeded = Math.max(32 - Integer.numberOfLeadingZeros(uniq), 1);
        long after = (long) uniq * w + (long) len * (bitsNeeded / 8) + len * 2 / 128;
        dictRatio = total / (double) Math.max(after, 1);
      }
      // Bitpacking: int32/date, 128-value blocks, non-negative (the
      // Python chooser's exact eligibility, codecs.py:199-207)
      double bpRatio = 0;
      int[] ints = null;
      if (w == 4 && len % 128 == 0
          && (allowed(forbid, QuiverPageDecoder.CODEC_BITPACKING)
              || allowed(forbid, QuiverPageDecoder.CODEC_DELTA_BITPACKING))
          && (col.type instanceof IntegerType || col.type instanceof DateType)) {
        ints = new int[len];
        boolean nonNeg = true;
        for (int i = 0; i < len; i++) {
          int v = (a[base + i * 4] & 0xFF) | ((a[base + i * 4 + 1] & 0xFF) << 8)
              | ((a[base + i * 4 + 2] & 0xFF) << 16) | ((a[base + i * 4 + 3] & 0xFF) << 24);
          if (v < 0) { nonNeg = false; break; }
          ints[i] = v;
        }
        if (nonNeg && allowed(forbid, QuiverPageDecoder.CODEC_BITPACKING)) {
          bpRatio = total / (double) Math.max(bitpackSize(ints), 1);
        }
        if (!nonNeg) ints = null;
      }
      // DeltaBitpacking: additionally sorted + no nulls in the page —
      // sorted keys/dates pack their (tiny) deltas instead of the values
      double deltaRatio = 0;
      int[] deltas = null;
      if (ints != null && allowed(forbid, QuiverPageDecoder.CODEC_DELTA_BITPACKING)) {
        boolean noNulls = true;
        if (col.valid != null) {
          for (int i = start; i < start + len; i++) {
            if (!col.valid[i]) { noNulls = false; break; }
          }
        }
        boolean ascending = noNulls;
        for (int i = 1; ascending && i < len; i++) {
          if (ints[i] < ints[i - 1]) ascending = false;
        }
        if (ascending && len > 1) {
          deltas = sortedDeltas(ints);
          deltaRatio = total / (double) Math.max(bitpackSize(deltas), 1);
        }
      }
      // Patas: float64 pages compete on a sampled ratio (the reference's
      // compress_sample_ratio posture — a full trial encode would double
      // the cost of every rejected page)
      double patasRatio = 0;
      long[] fbits = null;
      if (col.type instanceof DoubleType && len > 1
          && allowed(forbid, QuiverPageDecoder.CODEC_PATAS)) {
        fbits = new long[len];
        for (int i = 0; i < len; i++) {
          long v = 0;
          for (int k = 7; k >= 0; k--) v = (v << 8) | (a[base + i * 8 + k] & 0xFFL);
          fbits[i] = v;
        }
        patasRatio = patasSampleRatio(fbits, 8);
      }
      if (patasRatio >= thr && patasRatio >= rleRatio && patasRatio >= dictRatio) {
        frame(out, QuiverPageDecoder.CODEC_PATAS, patasEncode(fbits, 8), (int) total);
        return;
      }
      if (deltaRatio >= thr && deltaRatio >= bpRatio && deltaRatio >= rleRatio
          && deltaRatio >= dictRatio) {
        frame(out, QuiverPageDecoder.CODEC_DELTA_BITPACKING, bitpackPack(deltas), (int) total);
        return;
      }
      if (bpRatio >= thr && bpRatio >= rleRatio && bpRatio >= dictRatio) {
        frame(out, QuiverPageDecoder.CODEC_BITPACKING, bitpackPack(ints), (int) total);
        return;
      }
      if (rleRatio >= thr && rleRatio >= dictRatio) {
        LeBuf p = new LeBuf();
        int i = 0;
        while (i < len) {
          int j = i + 1;
          while (j < len && rangeEq(a, base + (j - 1) * w, base + j * w, w)) j++;
          p.putInt(j - i);
          p.putBytes(a, base + i * w, w);
          i = j;
        }
        byte[] payload = new byte[p.len];
        System.arraycopy(p.a, 0, payload, 0, p.len);
        frame(out, QuiverPageDecoder.CODEC_RLE, payload, (int) total);
        return;
      }
      if (dictRatio >= thr && dict != null) {
        // payload: frame(u32 codes — recursive cascade) | u32 nSets | dict
        int[] codes = new int[len];
        for (int i = 0; i < len; i++) {
          long key = 0;
          for (int k = w - 1; k >= 0; k--) key = (key << 8) | (a[base + i * w + k] & 0xFFL);
          codes[i] = dict.get(key);
        }
        LeBuf p = new LeBuf();
        encodeU32Frame(p, codes, codec, thr);
        p.putInt(uniq);
        for (long key : dict.keySet()) {
          for (int k = 0; k < w; k++) p.putByte((int) (key >>> (8 * k)));
        }
        byte[] payload = new byte[p.len];
        System.arraycopy(p.a, 0, payload, 0, p.len);
        frame(out, QuiverPageDecoder.CODEC_DICT, payload, (int) total);
        return;
      }
    }
    frame(out, codec, compress(codec, a, base, (int) total), (int) total);
  }

  static void encodeBinaryPage(LeBuf out, ColBuf col, int start, int len, int codec,
      double thr, int forbid) {
    byte[] a = col.values.a;
    int base = col.offsets[start];
    int vlen = col.offsets[start + len] - base;
    long total = (long) vlen + (long) (len + 1) * 4;
    if (thr > 0 && len > 0) {
      // OneValue: every slot identical to the first
      int l0 = col.offsets[start + 1] - col.offsets[start];
      boolean uniform = allowed(forbid, QuiverPageDecoder.CODEC_ONE_VALUE);
      for (int i = 1; i < len && uniform; i++) {
        int li = col.offsets[start + i + 1] - col.offsets[start + i];
        uniform = li == l0
            && rangeEq(a, col.offsets[start], col.offsets[start + i], l0);
      }
      if (uniform && len >= thr) {
        LeBuf p = new LeBuf();
        p.putInt(l0);
        p.putBytes(a, col.offsets[start], l0);
        byte[] payload = new byte[p.len];
        System.arraycopy(p.a, 0, payload, 0, p.len);
        frame(out, QuiverPageDecoder.CODEC_ONE_VALUE, payload, (int) total);
        return;
      }
      // Freq: one string covers >=90% (codecs.py binary chain:
      // one_value, elif freq, elif dict)
      if (len >= thr && allowed(forbid, QuiverPageDecoder.CODEC_FREQ)) {
        int cand = -1;
        int votes = 0;
        for (int i = 0; i < len; i++) {
          if (votes == 0) { cand = i; votes = 1; }
          else if (binEq(col, start + cand, start + i)) votes++;
          else votes--;
        }
        int count = 0;
        if (cand >= 0) {
          for (int i = 0; i < len; i++) {
            if (binEq(col, start + cand, start + i)) count++;
          }
        }
        int nExc = len - count;
        if (cand >= 0 && count >= 0.9 * len && nExc > 0 && nExc <= 4096) {
          int topOff = col.offsets[start + cand];
          int topLen = col.offsets[start + cand + 1] - topOff;
          int[] pos = new int[nExc];
          int e = 0;
          LeBuf p = new LeBuf();
          p.putLong(topLen);
          p.putBytes(a, topOff, topLen);
          for (int i = 0; i < len; i++) {
            if (!binEq(col, start + cand, start + i)) pos[e++] = i;
          }
          byte[] bm = roaringSerialize(pos);
          p.putInt(bm.length);
          p.putBytes(bm, 0, bm.length);
          for (int i = 0; i < len; i++) {
            if (binEq(col, start + cand, start + i)) continue;
            int o = col.offsets[start + i];
            int l = col.offsets[start + i + 1] - o;
            p.putLong(l);
            p.putBytes(a, o, l);
          }
          byte[] payload = new byte[p.len];
          System.arraycopy(p.a, 0, payload, 0, p.len);
          frame(out, QuiverPageDecoder.CODEC_FREQ, payload, (int) total);
          return;
        }
      }
      // Dict with early bail
      java.util.LinkedHashMap<ByteBuffer, Integer> dict =
          allowed(forbid, QuiverPageDecoder.CODEC_DICT)
              ? new java.util.LinkedHashMap<>() : null;
      long uniqBytes = 0;
      if (dict != null)
      for (int i = 0; i < len; i++) {
        ByteBuffer key = ByteBuffer.wrap(
            a, col.offsets[start + i],
            col.offsets[start + i + 1] - col.offsets[start + i]).slice();
        if (dict.putIfAbsent(key, dict.size()) == null) uniqBytes += key.remaining();
        if (dict.size() * 3 >= len) { dict = null; break; }
      }
      if (dict != null) {
        int uniq = dict.size();
        int bitsNeeded = Math.max(32 - Integer.numberOfLeadingZeros(Math.max(uniq, 1)), 1);
        long after = uniqBytes + (long) len * (bitsNeeded / 8) + len * 2 / 128;
        double ratio = total / (double) Math.max(after, 1);
        if (ratio >= thr) {
          int[] codes = new int[len];
          for (int i = 0; i < len; i++) {
            ByteBuffer key = ByteBuffer.wrap(
                a, col.offsets[start + i],
                col.offsets[start + i + 1] - col.offsets[start + i]).slice();
            codes[i] = dict.get(key);
          }
          LeBuf p = new LeBuf();
          encodeU32Frame(p, codes, codec, thr);
          p.putInt(uniq);
          for (ByteBuffer key : dict.keySet()) {
            p.putLong(key.remaining());
            byte[] kb = new byte[key.remaining()];
            key.duplicate().get(kb);
            p.putBytes(kb, 0, kb.length);
          }
          byte[] payload = new byte[p.len];
          System.arraycopy(p.a, 0, payload, 0, p.len);
          frame(out, QuiverPageDecoder.CODEC_DICT, payload, (int) total);
          return;
        }
      }
    }
    // basic two-frame layout: offsets rebased to 0, then values
    byte[] rawOff = new byte[(len + 1) * 4];
    ByteBuffer ob = ByteBuffer.wrap(rawOff).order(ByteOrder.LITTLE_ENDIAN);
    for (int i = 0; i <= len; i++) ob.putInt(col.offsets[start + i] - base);
    frame(out, codec, compress(codec, rawOff, 0, rawOff.length), rawOff.length);
    frame(out, codec, compress(codec, a, base, vlen), vlen);
  }

  static void encodeBoolPage(LeBuf out, ColBuf col, int start, int len, int codec,
      double thr, int forbid) {
    if (thr > 0 && len > 0) {
      boolean first = col.bools[start];
      int runs = 1;
      for (int i = 1; i < len; i++) {
        if (col.bools[start + i] != col.bools[start + i - 1]) runs++;
      }
      if (runs == 1 && allowed(forbid, QuiverPageDecoder.CODEC_ONE_VALUE)) {
        frame(out, QuiverPageDecoder.CODEC_ONE_VALUE,
            new byte[] {(byte) (first ? 1 : 0)}, len);
        return;
      }
      // codecs.py: (n+7)//8 > rle_size * compress_ratio
      if ((len + 7) / 8 > runs * 5 * thr
          && allowed(forbid, QuiverPageDecoder.CODEC_RLE)) {
        LeBuf p = new LeBuf();
        int i = 0;
        while (i < len) {
          int j = i + 1;
          while (j < len && col.bools[start + j] == col.bools[start + i]) j++;
          p.putInt(j - i);
          p.putByte(col.bools[start + i] ? 1 : 0);
          i = j;
        }
        byte[] payload = new byte[p.len];
        System.arraycopy(p.a, 0, payload, 0, p.len);
        frame(out, QuiverPageDecoder.CODEC_RLE, payload, len);
        return;
      }
    }
    int groups = (len + 7) / 8;
    byte[] raw = new byte[groups];
    for (int i = 0; i < len; i++) {
      if (col.bools[start + i]) raw[i >> 3] |= (1 << (i & 7));
    }
    // boolean frames store the VALUE count as usize (codecs.py:546)
    frame(out, codec, compress(codec, raw, 0, raw.length), len);
  }

  // ---- arrow schema bytes ---------------------------------------------

  static Field arrowField(StructField f) {
    return arrowFieldOf(f.name(), f.dataType(), f.nullable());
  }

  static Field arrowFieldOf(String name, DataType t, boolean nullable) {
    // nested types (round 12): children recurse; Spark's canonical child
    // names (element / entries / key / value) match the Python DS's
    // arrow conversion, and both readers resolve leaves structurally
    if (t instanceof org.apache.spark.sql.types.ArrayType) {
      org.apache.spark.sql.types.ArrayType a = (org.apache.spark.sql.types.ArrayType) t;
      Field elem = arrowFieldOf("element", a.elementType(), a.containsNull());
      return new Field(name, new FieldType(nullable, new ArrowType.List(), null),
          java.util.Arrays.asList(elem));
    }
    if (t instanceof StructType) {
      List<Field> ch = new ArrayList<>();
      for (StructField c : ((StructType) t).fields()) {
        ch.add(arrowFieldOf(c.name(), c.dataType(), c.nullable()));
      }
      return new Field(name, new FieldType(nullable, new ArrowType.Struct(), null), ch);
    }
    if (t instanceof org.apache.spark.sql.types.MapType) {
      org.apache.spark.sql.types.MapType m = (org.apache.spark.sql.types.MapType) t;
      Field k = arrowFieldOf("key", m.keyType(), false);
      Field v = arrowFieldOf("value", m.valueType(), m.valueContainsNull());
      Field entries = new Field("entries",
          new FieldType(false, new ArrowType.Struct(), null),
          java.util.Arrays.asList(k, v));
      return new Field(name, new FieldType(nullable, new ArrowType.Map(false), null),
          java.util.Arrays.asList(entries));
    }
    ArrowType at;
    if (t instanceof LongType) at = new ArrowType.Int(64, true);
    else if (t instanceof IntegerType) at = new ArrowType.Int(32, true);
    else if (t instanceof ShortType) at = new ArrowType.Int(16, true);
    else if (t instanceof ByteType) at = new ArrowType.Int(8, true);
    else if (t instanceof DoubleType) at = new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE);
    else if (t instanceof FloatType) at = new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE);
    else if (t instanceof StringType) at = new ArrowType.Utf8();
    else if (t instanceof BinaryType) at = new ArrowType.Binary();
    else if (t instanceof BooleanType) at = new ArrowType.Bool();
    else if (t instanceof DateType) at = new ArrowType.Date(DateUnit.DAY);
    else if (t instanceof TimestampNTZType) at = new ArrowType.Timestamp(TimeUnit.MICROSECOND, null);
    else if (t instanceof TimestampType) at = new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC");
    else if (t instanceof DecimalType) {
      DecimalType d = (DecimalType) t;
      at = new ArrowType.Decimal(d.precision(), d.scale(), 128);
    } else {
      throw new UnsupportedOperationException("quiverjvm: unsupported type " + t);
    }
    return new Field(name, new FieldType(nullable, at, null), null);
  }

  /** Raw flatbuffer Message bytes of the Arrow schema (pyarrow's
   * schema.serialize() minus its 8-byte continuation+length prefix —
   * reader._parse_schema re-wraps raw Message bytes). */
  static byte[] schemaBytes(StructType schema) {
    List<Field> fields = new ArrayList<>();
    for (StructField f : schema.fields()) fields.add(arrowField(f));
    ByteBuffer bb = MessageSerializer.serializeMetadata(new Schema(fields));
    byte[] out = new byte[bb.remaining()];
    bb.get(out);
    return out;
  }

  // ---- file assembly ---------------------------------------------------

  /** Encoded file blob plus its stats sidecar JSON (zone maps / blooms /
   * page CRCs — format/stats.py build_file_stats layout, version 1) and
   * the manifest-entry facts (sources/manifest.py _build_one layout) so a
   * JVM ingest commit can write the table manifest WITHOUT re-reading the
   * footers it just wrote. */
  public static final class Encoded {
    public final byte[] blob;
    public final String sidecarJson;
    /** manifest "metas": [[col_offset, [page_len, page_rows, ...]], ...] */
    public final String metasJson;
    public final long rows;

    Encoded(byte[] blob, String sidecarJson, String metasJson, long rows) {
      this.blob = blob;
      this.sidecarJson = sidecarJson;
      this.metasJson = metasJson;
      this.rows = rows;
    }
  }

  /** The schema as pyarrow's ``schema.serialize()`` bytes, base64 — an
   * encapsulated Arrow IPC message (0xFFFFFFFF continuation | int32 LE
   * length | flatbuffer, 8-byte padded) that manifest._schema_from_b64
   * (pa.ipc.read_schema) parses. schemaBytes() strips this prefix for the
   * file footer; the manifest keeps it. */
  static String schemaB64(StructType schema) {
    byte[] fb = schemaBytes(schema);
    int padded = (fb.length + 7) & ~7;
    ByteBuffer bb = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN);
    bb.putInt(0xFFFFFFFF);
    bb.putInt(padded);
    bb.put(fb);
    return java.util.Base64.getEncoder().encodeToString(bb.array());
  }

  /** Write all accumulated columns as one quiver file byte blob. */
  public static byte[] encodeFile(StructType schema, Object[] cols, int pageSize, int codec)
      throws IOException {
    return encodeFileWithSidecar(schema, cols, pageSize, codec, java.util.Collections.emptySet())
        .blob;
  }

  private static String metasJson(
      List<Long> colOffsets, List<int[]> pageLens, List<int[]> pageNumVals) {
    StringBuilder sb = new StringBuilder("[");
    for (int li = 0; li < colOffsets.size(); li++) {
      if (li > 0) sb.append(',');
      sb.append('[').append(colOffsets.get(li)).append(",[");
      for (int p = 0; p < pageLens.get(li).length; p++) {
        if (p > 0) sb.append(',');
        sb.append(pageLens.get(li)[p]).append(',').append(pageNumVals.get(li)[p]);
      }
      sb.append("]]");
    }
    return sb.append(']').toString();
  }

  public static Encoded encodeFileWithSidecar(
      StructType schema, Object[] cols, int pageSize, int codec, java.util.Set<String> bloomCols)
      throws IOException {
    return encodeFileWithSidecar(schema, cols, pageSize, codec, bloomCols, 2.0, 0);
  }

  static int colRows(Object col) {
    return col instanceof ColBuf
        ? ((ColBuf) col).n
        : ((QuiverNestedWrite.NestedColBuf) col).n;
  }

  /** cols entries are ColBuf (flat) or QuiverNestedWrite.NestedColBuf
   * (nested, one footer/manifest meta per primitive LEAF in shred order —
   * the Python writer's leaf-major layout). Nested leaf pages store the
   * page's SLOT count as their meta num_values and the row count in the
   * page's own u32 prefix, exactly like format/writer.py. */
  public static Encoded encodeFileWithSidecar(
      StructType schema, Object[] cols, int pageSize, int codec, java.util.Set<String> bloomCols,
      double adaptiveRatio, int forbid)
      throws IOException {
    int n = cols.length > 0 ? colRows(cols[0]) : 0;
    LeBuf out = new LeBuf();
    out.putBytes(MAGIC, 0, MAGIC.length);
    int nPages = n == 0 ? 1 : (n + pageSize - 1) / pageSize;
    List<Long> colOffsets = new ArrayList<>();   // leaf-major
    List<int[]> pageLens = new ArrayList<>();
    List<int[]> pageNumVals = new ArrayList<>(); // rows (flat) / slots (nested)
    List<long[]> crcList = new ArrayList<>();
    for (int ci = 0; ci < cols.length; ci++) {
      if (cols[ci] instanceof ColBuf) {
        ColBuf c = (ColBuf) cols[ci];
        colOffsets.add((long) out.len);
        int[] lens = new int[nPages];
        int[] nums = new int[nPages];
        long[] crcs = new long[nPages];
        for (int p = 0; p < nPages; p++) {
          int start = p * pageSize;
          int len = Math.min(pageSize, n - start);
          int before = out.len;
          encodePage(out, c, start, len, codec, adaptiveRatio, forbid);
          lens[p] = out.len - before;
          nums[p] = len;
          java.util.zip.CRC32 crc = new java.util.zip.CRC32();
          crc.update(out.a, before, out.len - before);
          crcs[p] = crc.getValue();
        }
        pageLens.add(lens);
        pageNumVals.add(nums);
        crcList.add(crcs);
      } else {
        QuiverNestedWrite.NestedColBuf nb = (QuiverNestedWrite.NestedColBuf) cols[ci];
        for (QuiverNestedWrite.LeafW lf : nb.leaves) {
          colOffsets.add((long) out.len);
          int[] lens = new int[nPages];
          int[] nums = new int[nPages];
          long[] crcs = new long[nPages];
          for (int p = 0; p < nPages; p++) {
            int r0 = p * pageSize;
            int r1 = Math.min(r0 + pageSize, n);
            int before = out.len;
            nums[p] = QuiverNestedWrite.encodeLeafPage(
                out, lf, r0, r1, codec, adaptiveRatio, forbid);
            lens[p] = out.len - before;
            java.util.zip.CRC32 crc = new java.util.zip.CRC32();
            crc.update(out.a, before, out.len - before);
            crcs[p] = crc.getValue();
          }
          pageLens.add(lens);
          pageNumVals.add(nums);
          crcList.add(crcs);
        }
      }
    }
    long[][] pageCrcs = crcList.toArray(new long[0][]);
    String sidecar = QuiverStatsBuilder.sidecarJson(
        schema, cols, pageSize, nPages, pageCrcs, bloomCols);
    byte[] sb = schemaBytes(schema);
    out.putBytes(sb, 0, sb.length);
    int metaStart = out.len;
    out.putLong(colOffsets.size());
    for (int li = 0; li < colOffsets.size(); li++) {
      out.putLong(colOffsets.get(li));
      out.putLong(pageLens.get(li).length);
      for (int p = 0; p < pageLens.get(li).length; p++) {
        out.putLong(pageLens.get(li)[p]);
        out.putLong(pageNumVals.get(li)[p]);
      }
    }
    int metaLen = out.len - metaStart;
    out.putInt(sb.length);
    out.putInt(metaLen);
    out.putBytes(EOS, 0, EOS.length);
    byte[] file = new byte[out.len];
    System.arraycopy(out.a, 0, file, 0, out.len);
    return new Encoded(file, sidecar, metasJson(colOffsets, pageLens, pageNumVals), n);
  }
}
