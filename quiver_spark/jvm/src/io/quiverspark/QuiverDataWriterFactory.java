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

  public QuiverDataWriterFactory(
      String path, String schemaJson, String codecName, int pageSize, long maxRowsPerFile) {
    this.path = path;
    this.schemaJson = schemaJson;
    this.codecName = codecName;
    this.pageSize = pageSize;
    this.maxRowsPerFile = maxRowsPerFile;
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
    return new QuiverTaskWriter(path, schema, codec, pageSize, maxRowsPerFile, partitionId, taskId);
  }

  static final class CommitMsg implements WriterCommitMessage {
    private static final long serialVersionUID = 1L;
    final String[] files;
    final long rows;

    CommitMsg(String[] files, long rows) {
      this.files = files;
      this.rows = rows;
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
    private final QuiverFileEncoder.ColBuf[] cols;
    private final StructField[] fields;
    private final List<File> tmpFiles = new ArrayList<>();
    private long rowsWritten = 0;
    private long rowsBuffered = 0;

    QuiverTaskWriter(String path, StructType schema, int codec, int pageSize,
        long maxRowsPerFile, int partitionId, long taskId) {
      this.path = path;
      this.schema = schema;
      this.codec = codec;
      this.pageSize = pageSize;
      this.maxRowsPerFile = maxRowsPerFile;
      this.partitionId = partitionId;
      this.taskId = taskId;
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
      byte[] blob = QuiverFileEncoder.encodeFile(schema, cols, pageSize, codec);
      // task-attempt isolation: land under a hidden tmp name, rename at
      // task commit — readers glob *.quiver and skip dotted names
      String name = String.format("part-%05d-%s.quiver", partitionId, UUID.randomUUID().toString().replace("-", ""));
      File tmp = new File(path, "." + name + ".tmp");
      try (FileOutputStream out = new FileOutputStream(tmp)) {
        out.write(blob);
      }
      tmpFiles.add(tmp);
      rowsWritten += rowsBuffered;
      rowsBuffered = 0;
      for (QuiverFileEncoder.ColBuf c : cols) c.reset();
    }

    @Override
    public WriterCommitMessage commit() throws IOException {
      flushFile();
      String[] finals = new String[tmpFiles.size()];
      for (int i = 0; i < tmpFiles.size(); i++) {
        File tmp = tmpFiles.get(i);
        String finalName = tmp.getName().substring(1, tmp.getName().length() - 4);
        File dst = new File(tmp.getParentFile(), finalName);
        if (!tmp.renameTo(dst)) {
          throw new IOException("quiverjvm: cannot publish " + tmp + " -> " + dst);
        }
        finals[i] = dst.getPath();
      }
      tmpFiles.clear();
      return new CommitMsg(finals, rowsWritten);
    }

    @Override
    public void abort() {
      for (File f : tmpFiles) f.delete();
      tmpFiles.clear();
    }

    @Override
    public void close() {}
  }
}
