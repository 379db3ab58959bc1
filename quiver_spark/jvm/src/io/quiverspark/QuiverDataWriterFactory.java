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
import org.apache.spark.sql.types.ShortType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;

/** Per-task writer: accumulate InternalRows columnar, roll quiver files. */
public class QuiverDataWriterFactory implements DataWriterFactory, Serializable {
  private static final long serialVersionUID = 1L;

  private final String path;
  private final String schemaJson; // StructType is Scala; ship JSON instead
  private final String codecName;
  private final int pageSize;
  private final long maxRowsPerFile;
  private final String bloomColumns; // csv of column names, "" = none

  public QuiverDataWriterFactory(
      String path, String schemaJson, String codecName, int pageSize, long maxRowsPerFile,
      String bloomColumns) {
    this.path = path;
    this.schemaJson = schemaJson;
    this.codecName = codecName;
    this.pageSize = pageSize;
    this.maxRowsPerFile = maxRowsPerFile;
    this.bloomColumns = bloomColumns;
  }

  @Override
  public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
    StructType schema = (StructType) DataType.fromJson(schemaJson);
    int codec;
    switch (codecName) {
      case "none": codec = QuiverFileEncoder.CODEC_NONE; break;
      case "lz4": codec = QuiverFileEncoder.CODEC_LZ4; break;
      case "zstd": codec = QuiverFileEncoder.CODEC_ZSTD; break;
      default:
        throw new IllegalArgumentException(
            "quiverjvm codec must be none|lz4|zstd (basic codecs); got " + codecName);
    }
    java.util.Set<String> blooms = new java.util.HashSet<>();
    for (String c : bloomColumns.split(",")) {
      if (!c.trim().isEmpty()) blooms.add(c.trim());
    }
    return new QuiverTaskWriter(
        path, schema, codec, pageSize, maxRowsPerFile, partitionId, taskId, blooms);
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

  static final class QuiverTaskWriter implements DataWriter<InternalRow> {
    private final String path;
    private final StructType schema;
    private final int codec;
    private final int pageSize;
    private final long maxRowsPerFile;
    private final int partitionId;
    private final long taskId;
    private final java.util.Set<String> bloomCols;
    private final QuiverFileEncoder.ColBuf[] cols;
    private final StructField[] fields;
    private final List<File> tmpFiles = new ArrayList<>();
    private final List<File> tmpSidecars = new ArrayList<>();
    /** per tmp file: {"fmt":"quiver","metas":…,"sidecar":…,"rows":N} —
     * size/mtime_ns appended at task commit, after the publish rename */
    private final List<String> partialEntries = new ArrayList<>();
    private long rowsWritten = 0;
    private long rowsBuffered = 0;

    QuiverTaskWriter(String path, StructType schema, int codec, int pageSize,
        long maxRowsPerFile, int partitionId, long taskId, java.util.Set<String> bloomCols) {
      this.path = path;
      this.schema = schema;
      this.codec = codec;
      this.pageSize = pageSize;
      this.maxRowsPerFile = maxRowsPerFile;
      this.partitionId = partitionId;
      this.taskId = taskId;
      this.bloomCols = bloomCols;
      this.fields = schema.fields();
      this.cols = new QuiverFileEncoder.ColBuf[fields.length];
      for (int i = 0; i < fields.length; i++) {
        cols[i] = new QuiverFileEncoder.ColBuf(fields[i]);
      }
    }

    @Override
    public void write(InternalRow row) throws IOException {
      for (int i = 0; i < fields.length; i++) {
        QuiverFileEncoder.ColBuf c = cols[i];
        if (row.isNullAt(i)) {
          c.addNull();
          continue;
        }
        DataType t = fields[i].dataType();
        if (t instanceof LongType || t instanceof TimestampType || t instanceof TimestampNTZType) {
          c.addLong(row.getLong(i));
        } else if (t instanceof IntegerType || t instanceof DateType) {
          c.addInt(row.getInt(i));
        } else if (t instanceof DoubleType) {
          c.addDouble(row.getDouble(i));
        } else if (t instanceof FloatType) {
          c.addFloat(row.getFloat(i));
        } else if (t instanceof StringType) {
          c.addBytes(row.getUTF8String(i).getBytes());
        } else if (t instanceof BinaryType) {
          c.addBytes(row.getBinary(i));
        } else if (t instanceof DecimalType) {
          BigInteger unscaled = row.getDecimal(i, c.decPrecision, c.decScale)
              .toJavaBigDecimal().unscaledValue();
          c.addDecimal(unscaled);
        } else if (t instanceof BooleanType) {
          c.addBool(row.getBoolean(i));
        } else if (t instanceof ShortType) {
          c.addShort(row.getShort(i));
        } else if (t instanceof ByteType) {
          c.addByteVal(row.getByte(i));
        } else {
          throw new UnsupportedOperationException("quiverjvm: unsupported type " + t);
        }
      }
      rowsBuffered++;
      if (rowsBuffered >= maxRowsPerFile) flushFile();
    }

    private void flushFile() throws IOException {
      if (rowsBuffered == 0) return;
      QuiverFileEncoder.Encoded enc =
          QuiverFileEncoder.encodeFileWithSidecar(schema, cols, pageSize, codec, bloomCols);
      // task-attempt isolation: land under a hidden tmp name, rename at
      // task commit — readers glob *.quiver and skip dotted names
      String name = String.format("part-%05d-%s.quiver", partitionId, UUID.randomUUID().toString().replace("-", ""));
      File tmp = new File(path, "." + name + ".tmp");
      try (FileOutputStream out = new FileOutputStream(tmp)) {
        out.write(enc.blob);
      }
      // stats sidecar (<file>.quiver.stats.json, format/stats.py layout):
      // same hidden-tmp protocol, renamed BEFORE its data file so a reader
      // that can see the data file always finds its sidecar
      File tmpSc = new File(path, "." + name + ".stats.json.tmp");
      try (FileOutputStream out = new FileOutputStream(tmpSc)) {
        out.write(enc.sidecarJson.getBytes(java.nio.charset.StandardCharsets.UTF_8));
      }
      tmpFiles.add(tmp);
      tmpSidecars.add(tmpSc);
      partialEntries.add(
          "{\"fmt\":\"quiver\",\"metas\":" + enc.metasJson
              + ",\"sidecar\":" + enc.sidecarJson + ",\"rows\":" + enc.rows);
      rowsWritten += rowsBuffered;
      rowsBuffered = 0;
      for (QuiverFileEncoder.ColBuf c : cols) c.reset();
    }

    @Override
    public WriterCommitMessage commit() throws IOException {
      flushFile();
      String[] finals = new String[tmpFiles.size()];
      String[] entries = new String[tmpFiles.size()];
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
        entries[i] = partialEntries.get(i)
            + ",\"size\":" + at.size() + ",\"mtime_ns\":" + mtimeNs
            + ",\"rel\":\"" + finalName + "\"}";
      }
      tmpFiles.clear();
      tmpSidecars.clear();
      partialEntries.clear();
      return new CommitMsg(finals, rowsWritten, entries);
    }

    @Override
    public void abort() {
      for (File f : tmpFiles) f.delete();
      for (File f : tmpSidecars) f.delete();
      tmpFiles.clear();
      tmpSidecars.clear();
      partialEntries.clear();
    }

    @Override
    public void close() {}
  }
}
