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
 * Scope: FLAT schemas only (the JVM fast-ingest path); nested columns and
 * the adaptive typed codecs (OneValue/Freq/Dict/RLE/BP/Patas) stay on the
 * Python writer, which remains the compaction/rewrite path.
 */
public final class QuiverFileEncoder {
  public static final byte[] MAGIC = {'A', 'R', 'R', 'O', 'W', '2', 0, 0};
  public static final byte[] EOS = {(byte) 0xFF, (byte) 0xFF, (byte) 0xFF, (byte) 0xFF, 0, 0, 0, 0};

  public static final int CODEC_NONE = 0;
  public static final int CODEC_LZ4 = 1;
  public static final int CODEC_ZSTD = 2;

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

  /** Encode one page of a column into `out`; returns the page's row count. */
  static void encodePage(LeBuf out, ColBuf col, int start, int len, int codec) {
    if (col.nullable) {
      byte[] v = validityBytes(col, start, len);
      out.putInt(v.length);
      out.putBytes(v, 0, v.length);
    }
    if (col.isBool) {
      int groups = (len + 7) / 8;
      byte[] raw = new byte[groups];
      for (int i = 0; i < len; i++) {
        if (col.bools[start + i]) raw[i >> 3] |= (1 << (i & 7));
      }
      // boolean frames store the VALUE count as usize (codecs.py:546)
      frame(out, codec, compress(codec, raw, 0, raw.length), len);
    } else if (col.isVarlen) {
      // offsets frame: n+1 int32 offsets rebased to 0
      byte[] rawOff = new byte[(len + 1) * 4];
      ByteBuffer ob = ByteBuffer.wrap(rawOff).order(ByteOrder.LITTLE_ENDIAN);
      int base = col.offsets[start];
      for (int i = 0; i <= len; i++) ob.putInt(col.offsets[start + i] - base);
      frame(out, codec, compress(codec, rawOff, 0, rawOff.length), rawOff.length);
      // values frame
      int vlen = col.offsets[start + len] - base;
      frame(out, codec, compress(codec, col.values.a, base, vlen), vlen);
    } else {
      int off = start * col.width;
      int blen = len * col.width;
      frame(out, codec, compress(codec, col.values.a, off, blen), blen);
    }
  }

  // ---- arrow schema bytes ---------------------------------------------

  static Field arrowField(StructField f) {
    DataType t = f.dataType();
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
    return new Field(f.name(), new FieldType(f.nullable(), at, null), null);
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
  public static byte[] encodeFile(StructType schema, ColBuf[] cols, int pageSize, int codec)
      throws IOException {
    return encodeFileWithSidecar(schema, cols, pageSize, codec, java.util.Collections.emptySet())
        .blob;
  }

  private static String metasJson(long[] colOffsets, int[][] pageLens, int[][] pageRows) {
    StringBuilder sb = new StringBuilder("[");
    for (int ci = 0; ci < colOffsets.length; ci++) {
      if (ci > 0) sb.append(',');
      sb.append('[').append(colOffsets[ci]).append(",[");
      for (int p = 0; p < pageLens[ci].length; p++) {
        if (p > 0) sb.append(',');
        sb.append(pageLens[ci][p]).append(',').append(pageRows[ci][p]);
      }
      sb.append("]]");
    }
    return sb.append(']').toString();
  }

  public static Encoded encodeFileWithSidecar(
      StructType schema, ColBuf[] cols, int pageSize, int codec, java.util.Set<String> bloomCols)
      throws IOException {
    int n = cols.length > 0 ? cols[0].n : 0;
    LeBuf out = new LeBuf();
    out.putBytes(MAGIC, 0, MAGIC.length);
    long[] colOffsets = new long[cols.length];
    int[][] pageLens = new int[cols.length][];
    int[][] pageRows = new int[cols.length][];
    long[][] pageCrcs = new long[cols.length][];
    int nPages = n == 0 ? 1 : (n + pageSize - 1) / pageSize;
    for (int ci = 0; ci < cols.length; ci++) {
      colOffsets[ci] = out.len;
      pageLens[ci] = new int[nPages];
      pageRows[ci] = new int[nPages];
      pageCrcs[ci] = new long[nPages];
      for (int p = 0; p < nPages; p++) {
        int start = p * pageSize;
        int len = Math.min(pageSize, n - start);
        int before = out.len;
        encodePage(out, cols[ci], start, len, codec);
        pageLens[ci][p] = out.len - before;
        pageRows[ci][p] = len;
        java.util.zip.CRC32 crc = new java.util.zip.CRC32();
        crc.update(out.a, before, out.len - before);
        pageCrcs[ci][p] = crc.getValue();
      }
    }
    String sidecar = QuiverStatsBuilder.sidecarJson(
        schema, cols, pageSize, nPages, pageCrcs, bloomCols);
    byte[] sb = schemaBytes(schema);
    out.putBytes(sb, 0, sb.length);
    int metaStart = out.len;
    out.putLong(cols.length);
    for (int ci = 0; ci < cols.length; ci++) {
      out.putLong(colOffsets[ci]);
      out.putLong(pageLens[ci].length);
      for (int p = 0; p < pageLens[ci].length; p++) {
        out.putLong(pageLens[ci][p]);
        out.putLong(pageRows[ci][p]);
      }
    }
    int metaLen = out.len - metaStart;
    out.putInt(sb.length);
    out.putInt(metaLen);
    out.putBytes(EOS, 0, EOS.length);
    byte[] file = new byte[out.len];
    System.arraycopy(out.a, 0, file, 0, out.len);
    return new Encoded(file, sidecar, metasJson(colOffsets, pageLens, pageRows), n);
  }
}
