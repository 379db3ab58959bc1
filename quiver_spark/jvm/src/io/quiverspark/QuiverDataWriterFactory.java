package io.quiverspark;

import java.io.File;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.Serializable;
import java.math.BigInteger;
import java.util.ArrayList;
import java.util.List;
import java.util.UUID;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.ArrayType;
import org.apache.spark.sql.types.BinaryType;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.ByteType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DateType;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.IntegerType;
import org.apache.spark.sql.types.LongType;
import org.apache.spark.sql.types.MapType;
import org.apache.spark.sql.types.ShortType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;

/** Per-task writer: accumulate InternalRows columnar, roll quiver files.
 *
 * With {@code partitionBy} (round 11) each task fans rows into Hive
 * {@code col=value} subdirectories — partition columns are encoded in the
 * path (Python-sink `_part_segment` parity: str(value), %-quoted with no
 * safe chars, nulls as __HIVE_DEFAULT_PARTITION__) and EXCLUDED from the
 * file schema, exactly the layout the JVM and Python readers discover.
 * Buffers are per live key; callers should repartition by the partition
 * columns upstream (maintenance.ingest does) so a task sees few keys. */
public class QuiverDataWriterFactory implements DataWriterFactory, Serializable {
  private static final long serialVersionUID = 1L;

  private final String path;
  private final String schemaJson; // StructType is Scala; ship JSON instead
  private final String codecName;
  private final int pageSize;
  private final long maxRowsPerFile;
  private final String bloomColumns; // csv of column names, "" = none
  private final String partitionCols; // csv, "" = flat layout
  private final double compressRatio; // adaptive chooser threshold; <=0 off
  private final String forbidden; // csv of typed codecs excluded from the chooser

  public QuiverDataWriterFactory(
      String path, String schemaJson, String codecName, int pageSize, long maxRowsPerFile,
      String bloomColumns, String partitionCols, double compressRatio, String forbidden) {
    this.forbidden = forbidden;
    this.path = path;
    this.schemaJson = schemaJson;
    this.codecName = codecName;
    this.pageSize = pageSize;
    this.maxRowsPerFile = maxRowsPerFile;
    this.bloomColumns = bloomColumns;
    this.partitionCols = partitionCols;
    this.compressRatio = compressRatio;
  }

  @Override
  public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
    StructType schema = (StructType) DataType.fromJson(schemaJson);
    int codec;
    switch (codecName) {
      case "none": codec = QuiverFileEncoder.CODEC_NONE; break;
      case "lz4": codec = QuiverFileEncoder.CODEC_LZ4; break;
      case "zstd": codec = QuiverFileEncoder.CODEC_ZSTD; break;
      case "snappy": codec = QuiverFileEncoder.CODEC_SNAPPY; break;
      default:
        throw new IllegalArgumentException(
            "quiverjvm codec must be none|lz4|zstd|snappy (basic codecs); got " + codecName);
    }
    java.util.Set<String> blooms = new java.util.HashSet<>();
    for (String c : bloomColumns.split(",")) {
      if (!c.trim().isEmpty()) blooms.add(c.trim());
    }
    List<String> parts = new ArrayList<>();
    for (String c : partitionCols.split(",")) {
      if (!c.trim().isEmpty()) parts.add(c.trim());
    }
    return new QuiverTaskWriter(
        path, schema, codec, pageSize, maxRowsPerFile, partitionId, taskId, blooms, parts,
        compressRatio, QuiverFileEncoder.forbidMask(forbidden));
  }

  static final class CommitMsg implements WriterCommitMessage {
    private static final long serialVersionUID = 1L;
    final String[] files;
    final long rows;
    /** Per-file manifest-entry JSON (parallel to {@code files}): the facts
     * the driver-side commit needs to write the table manifest without
     * re-reading a single footer it just wrote. */
    final String[] entryJsons;

    CommitMsg(String[] files, long rows, String[] entryJsons) {
      this.files = files;
      this.rows = rows;
      this.entryJsons = entryJsons;
    }
  }

  /** One Hive partition key's open columnar buffers (flat ColBuf or
   * nested Dremel buffers — round 12). */
  static final class KeyState {
    final Object[] cols;
    long rowsBuffered = 0;

    KeyState(StructField[] dataFields) {
      cols = new Object[dataFields.length];
      for (int i = 0; i < dataFields.length; i++) {
        DataType t = dataFields[i].dataType();
        if (t instanceof ArrayType || t instanceof MapType || t instanceof StructType) {
          cols[i] = new QuiverNestedWrite.NestedColBuf(dataFields[i]);
        } else {
          cols[i] = new QuiverFileEncoder.ColBuf(dataFields[i]);
        }
      }
    }
  }

  static final class QuiverTaskWriter implements DataWriter<InternalRow> {
    private final String path;
    private final int codec;
    private final int pageSize;
    private final long maxRowsPerFile;
    private final int partitionId;
    private final long taskId;
    private final java.util.Set<String> bloomCols;
    /** row positions of data columns (everything but partition keys) */
    private final int[] dataIdx;
    /** row positions of partition-key columns, partitionBy order */
    private final int[] partIdx;
    private final String[] partNames;
    private final StructField[] fields;      // full row schema
    private final StructField[] dataFields;  // file schema
    private final StructType dataSchema;
    private final java.util.LinkedHashMap<String, KeyState> open = new java.util.LinkedHashMap<>();
    private final List<File> tmpFiles = new ArrayList<>();
    private final List<File> tmpSidecars = new ArrayList<>();
    private final List<String> tmpKeys = new ArrayList<>();
    /** per tmp file: {"fmt":"quiver","metas":…,"sidecar":…,"rows":N} —
     * size/mtime_ns appended at task commit, after the publish rename */
    private final List<String> partialEntries = new ArrayList<>();
    private long rowsWritten = 0;

    private final double compressRatio;
    private final int forbid;

    QuiverTaskWriter(String path, StructType schema, int codec, int pageSize,
        long maxRowsPerFile, int partitionId, long taskId, java.util.Set<String> bloomCols,
        List<String> partitionCols, double compressRatio, int forbid) {
      this.path = path;
      this.compressRatio = compressRatio;
      this.forbid = forbid;
      this.codec = codec;
      this.pageSize = pageSize;
      this.maxRowsPerFile = maxRowsPerFile;
      this.partitionId = partitionId;
      this.taskId = taskId;
      this.bloomCols = bloomCols;
      this.fields = schema.fields();
      this.partNames = partitionCols.toArray(new String[0]);
      this.partIdx = new int[partNames.length];
      for (int i = 0; i < partNames.length; i++) {
        this.partIdx[i] = schema.fieldIndex(partNames[i]);
      }
      List<Integer> data = new ArrayList<>();
      for (int i = 0; i < fields.length; i++) {
        boolean isPart = false;
        for (int pi : partIdx) {
          if (pi == i) { isPart = true; break; }
        }
        if (!isPart) data.add(i);
      }
      this.dataIdx = new int[data.size()];
      this.dataFields = new StructField[data.size()];
      StructType ds = new StructType();
      for (int i = 0; i < data.size(); i++) {
        dataIdx[i] = data.get(i);
        dataFields[i] = fields[data.get(i)];
        ds = ds.add(dataFields[i]);
      }
      this.dataSchema = ds;
      if (dataIdx.length == 0) {
        throw new IllegalArgumentException(
            "quiverjvm: partitionBy covers every column — nothing to store in files");
      }
    }

    /** urllib.parse.quote(s, safe="") mirror: %XX (uppercase) for all
     * bytes outside ALPHA / DIGIT / "_.-~". */
    static String quoteSegment(String s) {
      StringBuilder sb = new StringBuilder(s.length());
      for (byte b : s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
        char c = (char) (b & 0xFF);
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
            || c == '_' || c == '.' || c == '-' || c == '~') {
          sb.append(c);
        } else {
          sb.append('%').append(String.format("%02X", b & 0xFF));
        }
      }
      return sb.toString();
    }

    /** str(value) for a partition key, matching the Python sink's
     * `_part_segment` (and the read-side kind inference). */
    private String partValueString(InternalRow row, int i) {
      if (row.isNullAt(i)) return null;
      DataType t = fields[i].dataType();
      if (t instanceof LongType) return String.valueOf(row.getLong(i));
      if (t instanceof IntegerType) return String.valueOf(row.getInt(i));
      if (t instanceof ShortType) return String.valueOf(row.getShort(i));
      if (t instanceof ByteType) return String.valueOf(row.getByte(i));
      if (t instanceof StringType) return row.getUTF8String(i).toString();
      if (t instanceof BooleanType) return row.getBoolean(i) ? "True" : "False";
      if (t instanceof DateType) {
        return java.time.LocalDate.ofEpochDay(row.getInt(i)).toString();
      }
      throw new UnsupportedOperationException(
          "quiverjvm: unsupported partition-key type " + t + " for column "
              + fields[i].name() + " (use integral/string/boolean/date keys)");
    }

    private String keyFor(InternalRow row) {
      if (partIdx.length == 0) return "";
      StringBuilder sb = new StringBuilder();
      for (int k = 0; k < partIdx.length; k++) {
        if (k > 0) sb.append('/');
        String v = partValueString(row, partIdx[k]);
        sb.append(partNames[k]).append('=');
        sb.append(v == null ? "__HIVE_DEFAULT_PARTITION__" : quoteSegment(v));
      }
      return sb.toString();
    }

    @Override
    public void write(InternalRow row) throws IOException {
      String key = keyFor(row);
      KeyState st = open.get(key);
      if (st == null) {
        st = new KeyState(dataFields);
        open.put(key, st);
      }
      for (int i = 0; i < dataIdx.length; i++) {
        int ri = dataIdx[i];
        DataType t = dataFields[i].dataType();
        if (st.cols[i] instanceof QuiverNestedWrite.NestedColBuf) {
          QuiverNestedWrite.NestedColBuf nb = (QuiverNestedWrite.NestedColBuf) st.cols[i];
          nb.add(row.isNullAt(ri) ? null : QuiverNestedWrite.get(row, ri, t));
          continue;
        }
        QuiverFileEncoder.ColBuf c = (QuiverFileEncoder.ColBuf) st.cols[i];
        if (row.isNullAt(ri)) {
          c.addNull();
          continue;
        }
        if (t instanceof LongType || t instanceof TimestampType || t instanceof TimestampNTZType) {
          c.addLong(row.getLong(ri));
        } else if (t instanceof IntegerType || t instanceof DateType) {
          c.addInt(row.getInt(ri));
        } else if (t instanceof DoubleType) {
          c.addDouble(row.getDouble(ri));
        } else if (t instanceof FloatType) {
          c.addFloat(row.getFloat(ri));
        } else if (t instanceof StringType) {
          c.addBytes(row.getUTF8String(ri).getBytes());
        } else if (t instanceof BinaryType) {
          c.addBytes(row.getBinary(ri));
        } else if (t instanceof DecimalType) {
          BigInteger unscaled = row.getDecimal(ri, c.decPrecision, c.decScale)
              .toJavaBigDecimal().unscaledValue();
          c.addDecimal(unscaled);
        } else if (t instanceof BooleanType) {
          c.addBool(row.getBoolean(ri));
        } else if (t instanceof ShortType) {
          c.addShort(row.getShort(ri));
        } else if (t instanceof ByteType) {
          c.addByteVal(row.getByte(ri));
        } else {
          throw new UnsupportedOperationException("quiverjvm: unsupported type " + t);
        }
      }
      st.rowsBuffered++;
      if (st.rowsBuffered >= maxRowsPerFile) flushKey(key, st);
    }

    private void flushKey(String key, KeyState st) throws IOException {
      if (st.rowsBuffered == 0) return;
      QuiverFileEncoder.Encoded enc =
          QuiverFileEncoder.encodeFileWithSidecar(
              dataSchema, st.cols, pageSize, codec, bloomCols, compressRatio, forbid);
      // task-attempt isolation: land under a hidden tmp name, rename at
      // task commit — readers glob *.quiver and skip dotted names
      String name = String.format("part-%05d-%s.quiver", partitionId, UUID.randomUUID().toString().replace("-", ""));
      File dir = key.isEmpty() ? new File(path) : new File(path, key);
      dir.mkdirs();
      File tmp = new File(dir, "." + name + ".tmp");
      try (FileOutputStream out = new FileOutputStream(tmp)) {
        out.write(enc.blob);
      }
      // stats sidecar (<file>.quiver.stats.json, format/stats.py layout):
      // same hidden-tmp protocol, renamed BEFORE its data file so a reader
      // that can see the data file always finds its sidecar
      File tmpSc = new File(dir, "." + name + ".stats.json.tmp");
      try (FileOutputStream out = new FileOutputStream(tmpSc)) {
        out.write(enc.sidecarJson.getBytes(java.nio.charset.StandardCharsets.UTF_8));
      }
      tmpFiles.add(tmp);
      tmpSidecars.add(tmpSc);
      tmpKeys.add(key);
      partialEntries.add(
          "{\"fmt\":\"quiver\",\"metas\":" + enc.metasJson
              + ",\"sidecar\":" + enc.sidecarJson + ",\"rows\":" + enc.rows);
      rowsWritten += st.rowsBuffered;
      st.rowsBuffered = 0;
      for (Object c : st.cols) {
        if (c instanceof QuiverFileEncoder.ColBuf) ((QuiverFileEncoder.ColBuf) c).reset();
        else ((QuiverNestedWrite.NestedColBuf) c).reset();
      }
    }

    @Override
    public WriterCommitMessage commit() throws IOException {
      for (java.util.Map.Entry<String, KeyState> e : open.entrySet()) {
        flushKey(e.getKey(), e.getValue());
      }
      open.clear();
      String[] finals = new String[tmpFiles.size()];
      String[] entries = new String[tmpFiles.size()];
      com.fasterxml.jackson.databind.ObjectMapper om =
          new com.fasterxml.jackson.databind.ObjectMapper();
      for (int i = 0; i < tmpFiles.size(); i++) {
        File tmp = tmpFiles.get(i);
        String finalName = tmp.getName().substring(1, tmp.getName().length() - 4);
        File sc = new File(tmp.getParentFile(), finalName + ".stats.json");
        if (!tmpSidecars.get(i).renameTo(sc)) {
          throw new IOException("quiverjvm: cannot publish sidecar " + sc);
        }
        File dst = new File(tmp.getParentFile(), finalName);
        if (!tmp.renameTo(dst)) {
          throw new IOException("quiverjvm: cannot publish " + tmp + " -> " + dst);
        }
        finals[i] = dst.getPath();
        // size/mtime_ns from the PUBLISHED file's stat — the manifest
        // staleness check compares against os.stat, byte-for-byte
        java.nio.file.attribute.BasicFileAttributes at =
            java.nio.file.Files.readAttributes(
                dst.toPath(), java.nio.file.attribute.BasicFileAttributes.class);
        long mtimeNs = at.lastModifiedTime().to(java.util.concurrent.TimeUnit.NANOSECONDS);
        String key = tmpKeys.get(i);
        String rel = key.isEmpty() ? finalName : key + "/" + finalName;
        String relJson;
        try {
          relJson = om.writeValueAsString(rel); // key segments may need escaping
        } catch (com.fasterxml.jackson.core.JsonProcessingException ex) {
          throw new IOException(ex);
        }
        entries[i] = partialEntries.get(i)
            + ",\"size\":" + at.size() + ",\"mtime_ns\":" + mtimeNs
            + ",\"rel\":" + relJson + "}";
      }
      tmpFiles.clear();
      tmpSidecars.clear();
      tmpKeys.clear();
      partialEntries.clear();
      return new CommitMsg(finals, rowsWritten, entries);
    }

    @Override
    public void abort() {
      for (File f : tmpFiles) f.delete();
      for (File f : tmpSidecars) f.delete();
      tmpFiles.clear();
      tmpSidecars.clear();
      tmpKeys.clear();
      partialEntries.clear();
    }

    @Override
    public void close() {}
  }
}
