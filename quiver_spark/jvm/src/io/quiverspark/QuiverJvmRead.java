package io.quiverspark;

import java.io.ByteArrayInputStream;
import java.io.File;
import java.io.IOException;
import java.io.RandomAccessFile;
import java.io.Serializable;
import java.math.BigDecimal;
import java.math.BigInteger;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.nio.channels.Channels;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.util.ArrayList;
import java.util.List;
import java.util.zip.GZIPInputStream;

import org.apache.arrow.vector.ipc.ReadChannel;
import org.apache.arrow.vector.ipc.message.MessageSerializer;
import org.apache.arrow.vector.types.pojo.ArrowType;
import org.apache.arrow.vector.types.pojo.Field;
import org.apache.arrow.vector.types.pojo.Schema;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.Decimal;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.vectorized.ColumnarBatch;

/**
 * JVM scan for quiver tables ("quiverjvm" read path): full adaptive codec
 * surface (QuiverPageDecoder) over FLAT schemas, emitting ColumnarBatch
 * per page so whole-stage codegen consumes columns directly — no
 * JVM→Python boundary, no planner-process spawn. The floor-bound Python-DS
 * proxies (narrow projection, many small files) are this path's targets.
 *
 * Correctness boundary (everything else → the Python "quiver" DataSource,
 * which owns pruning/evolution/DML semantics):
 * - nested / unsupported leaf types → UnsupportedOperationException
 * - Hive-partitioned layouts (a path segment containing '=') → rejected
 * - manifests carrying a DECLARED schema or rename maps (ALTER DDL) →
 *   rejected (footer inference would serve the wrong schema)
 * Generation layouts resolve through `_current` exactly like the Python
 * planner; column pruning arrives via Catalyst's
 * SupportsPushDownRequiredColumns (the JVM DSv2 gets what the Python DS
 * structurally cannot).
 */
public final class QuiverJvmRead {
  private QuiverJvmRead() {}

  // ---- table resolution --------------------------------------------------

  static String resolveRoot(String path) throws IOException {
    File cur = new File(path, "_current");
    if (cur.isFile()) {
      String gen = new String(Files.readAllBytes(cur.toPath()), StandardCharsets.UTF_8).trim();
      return new File(path, gen).getPath();
    }
    return path;
  }

  static void listFiles(File dir, List<File> out) {
    File[] entries = dir.listFiles();
    if (entries == null) return;
    java.util.Arrays.sort(entries);
    for (File e : entries) {
      String n = e.getName();
      if (n.startsWith("_") || n.startsWith(".")) continue;
      if (e.isDirectory()) {
        if (n.contains("=")) {
          throw new UnsupportedOperationException(
              "quiverjvm: Hive-partitioned layout (" + n + "): read with the Python 'quiver' DataSource");
        }
        listFiles(e, out);
      } else if (n.endsWith(".quiver")) {
        out.add(e);
      }
    }
  }

  /** Plan-time footer reads (test pin: manifest-served planning must do
   * ZERO of these — the round-8/9 O(files) metadata lesson, JVM edition). */
  static final java.util.concurrent.atomic.AtomicLong PLAN_FOOTER_READS =
      new java.util.concurrent.atomic.AtomicLong();

  /** Pages excluded by zone-map pruning across plans (test observability). */
  static final java.util.concurrent.atomic.AtomicLong PAGES_PRUNED =
      new java.util.concurrent.atomic.AtomicLong();

  /** py4j-friendly accessors (AtomicLong is a Number — py4j unboxes it). */
  public static long planFooterReads() {
    return PLAN_FOOTER_READS.get();
  }

  public static long pagesPruned() {
    return PAGES_PRUNED.get();
  }

  public static void resetPagesPruned() {
    PAGES_PRUNED.set(0);
  }

  /** Test hook: BLAKE2b-128 hex of raw bytes (parity vs hashlib.blake2b). */
  public static String blake2b128Hex(byte[] data) {
    byte[] d = Blake2b.digest(data, 16);
    StringBuilder sb = new StringBuilder(32);
    for (byte b : d) sb.append(String.format("%02x", b));
    return sb.toString();
  }

  public static void resetPlanFooterReads() {
    PLAN_FOOTER_READS.set(0);
  }

  /** Parsed commit-time manifest (sources/manifest.py's _manifest.json.gz),
   * or null when absent. Parsing uses the Jackson bundled with Spark. */
  static com.fasterxml.jackson.databind.JsonNode readManifestRaw(String root)
      throws IOException {
    File man = new File(root, "_manifest.json.gz");
    if (!man.isFile()) return null;
    byte[] gz = Files.readAllBytes(man.toPath());
    try (GZIPInputStream in = new GZIPInputStream(new ByteArrayInputStream(gz))) {
      return new com.fasterxml.jackson.databind.ObjectMapper().readTree(in);
    }
  }

  /** Reject table-level semantics this reader cannot honor — loudly,
   * never by misreading. The Python DataSource owns these features. */
  static void guardManifestNode(com.fasterxml.jackson.databind.JsonNode m) {
    if (m == null) return;
    if (m.has("table_schema")) {
      throw new UnsupportedOperationException(
          "quiverjvm: table carries an ALTER-DDL declared schema: "
              + "read with the Python 'quiver' DataSource");
    }
    if (m.has("column_defaults") && m.get("column_defaults").size() > 0) {
      throw new UnsupportedOperationException(
          "quiverjvm: table carries column initial-defaults: "
              + "read with the Python 'quiver' DataSource");
    }
    com.fasterxml.jackson.databind.JsonNode files = m.get("files");
    if (files != null) {
      int schemaIdx = Integer.MIN_VALUE;
      for (java.util.Iterator<String> it = files.fieldNames(); it.hasNext(); ) {
        com.fasterxml.jackson.databind.JsonNode e = files.get(it.next());
        if (e.has("cmap") && !e.get("cmap").isNull()) {
          throw new UnsupportedOperationException(
              "quiverjvm: table carries column rename maps: "
                  + "read with the Python 'quiver' DataSource");
        }
        if (e.has("schema") && "quiver".equals(e.path("fmt").asText("quiver"))) {
          int idx = e.get("schema").asInt();
          if (schemaIdx == Integer.MIN_VALUE) schemaIdx = idx;
          else if (schemaIdx != idx) {
            throw new UnsupportedOperationException(
                "quiverjvm: files carry heterogeneous schemas (merge-schemas "
                    + "table): read with the Python 'quiver' DataSource");
          }
        }
      }
    }
  }

  static void guardManifest(String root) throws IOException {
    guardManifestNode(readManifestRaw(root));
  }

  /** Schema served from the manifest's deduplicated b64 Arrow-IPC schema
   * table (ZERO footer reads), or null → caller falls back to a footer. */
  static Schema manifestSchema(com.fasterxml.jackson.databind.JsonNode m) {
    try {
      if (m == null || !m.has("schemas") || m.get("schemas").size() == 0) return null;
      byte[] ipc = java.util.Base64.getDecoder().decode(m.get("schemas").get(0).asText());
      return MessageSerializer.deserializeSchema(
          new ReadChannel(Channels.newChannel(new ByteArrayInputStream(ipc))));
    } catch (Exception e) {
      return null;
    }
  }

  /** Per-page projected byte sizes for one file, decoded from the
   * manifest entry's compact metas ([[offset,[len,n,len,n,...]],...]);
   * null when the entry cannot serve the plan (missing/stale/foreign). */
  static long[] manifestPageBytes(
      com.fasterxml.jackson.databind.JsonNode m, String rel, long diskSize, int[] projIdx) {
    if (m == null) return null;
    com.fasterxml.jackson.databind.JsonNode files = m.get("files");
    if (files == null) return null;
    com.fasterxml.jackson.databind.JsonNode e = files.get(rel);
    if (e == null || !"quiver".equals(e.path("fmt").asText(""))) return null;
    // staleness guard: a file rewritten after the commit has a different
    // size — fall back to footer planning rather than plan stale ranges
    if (e.path("size").asLong(-1) != diskSize) return null;
    com.fasterxml.jackson.databind.JsonNode metas = e.get("metas");
    if (metas == null || metas.size() == 0) return null;
    int nPages = metas.get(0).get(1).size() / 2;
    long[] pb = new long[nPages];
    for (int idx : (projIdx.length > 0 ? projIdx : new int[] {0})) {
      if (idx >= metas.size()) return null;
      com.fasterxml.jackson.databind.JsonNode flat = metas.get(idx).get(1);
      for (int p = 0; p < nPages && p * 2 < flat.size(); p++) {
        pb[p] += flat.get(p * 2).asLong();
      }
    }
    return pb;
  }

  // ---- footer ------------------------------------------------------------

  static final class PageMeta implements Serializable {
    private static final long serialVersionUID = 1L;
    final long length;
    final long numValues;

    PageMeta(long length, long numValues) {
      this.length = length;
      this.numValues = numValues;
    }
  }

  static final class ColMeta implements Serializable {
    private static final long serialVersionUID = 1L;
    final long offset;
    final PageMeta[] pages;

    ColMeta(long offset, PageMeta[] pages) {
      this.offset = offset;
      this.pages = pages;
    }
  }

  static final class Footer {
    final Schema arrowSchema;
    final ColMeta[] cols;

    Footer(Schema arrowSchema, ColMeta[] cols) {
      this.arrowSchema = arrowSchema;
      this.cols = cols;
    }
  }

  static Footer readFooter(File f) throws IOException {
    try (RandomAccessFile raf = new RandomAccessFile(f, "r")) {
      long size = raf.length();
      if (size < 24) throw new IOException("not a quiver file (too small): " + f);
      byte[] tail = new byte[16];
      raf.seek(size - 16);
      raf.readFully(tail);
      ByteBuffer bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN);
      int schemaSize = bb.getInt(0);
      int metaSize = bb.getInt(4);
      // EOS trailer: FFFFFFFF 00000000
      if (bb.getInt(8) != -1 || bb.getInt(12) != 0) {
        throw new IOException("corrupt quiver footer (bad EOS): " + f);
      }
      long start = size - 16L - metaSize - schemaSize;
      if (start < 8) throw new IOException("corrupt quiver footer (sizes exceed file): " + f);
      byte[] block = new byte[schemaSize + metaSize];
      raf.seek(start);
      raf.readFully(block);

      // schema: raw flatbuffer Message → frame for arrow-java
      int pad = (8 - (schemaSize % 8)) % 8;
      ByteBuffer framed = ByteBuffer.allocate(8 + schemaSize + pad).order(ByteOrder.LITTLE_ENDIAN);
      framed.putInt(0xFFFFFFFF);
      framed.putInt(schemaSize + pad);
      framed.put(block, 0, schemaSize);
      framed.position(0);
      Schema arrowSchema = MessageSerializer.deserializeSchema(
          new ReadChannel(Channels.newChannel(new ByteArrayInputStream(framed.array()))));

      ByteBuffer mb = ByteBuffer.wrap(block, schemaSize, metaSize).order(ByteOrder.LITTLE_ENDIAN);
      long nCols = mb.getLong();
      ColMeta[] cols = new ColMeta[(int) nCols];
      for (int c = 0; c < nCols; c++) {
        long offset = mb.getLong();
        long nPages = mb.getLong();
        PageMeta[] pages = new PageMeta[(int) nPages];
        for (int p = 0; p < nPages; p++) {
          pages[p] = new PageMeta(mb.getLong(), mb.getLong());
        }
        cols[c] = new ColMeta(offset, pages);
      }
      return new Footer(arrowSchema, cols);
    }
  }

  // ---- arrow → spark type mapping (flat surface) -------------------------

  static DataType sparkType(Field f) {
    ArrowType t = f.getType();
    if (t instanceof ArrowType.Int) {
      ArrowType.Int it = (ArrowType.Int) t;
      if (!it.getIsSigned()) {
        throw new UnsupportedOperationException(
            "quiverjvm: unsigned int column '" + f.getName() + "': use the Python DataSource");
      }
      switch (it.getBitWidth()) {
        case 8: return DataTypes.ByteType;
        case 16: return DataTypes.ShortType;
        case 32: return DataTypes.IntegerType;
        case 64: return DataTypes.LongType;
        default: throw new UnsupportedOperationException("int width " + it.getBitWidth());
      }
    }
    if (t instanceof ArrowType.FloatingPoint) {
      switch (((ArrowType.FloatingPoint) t).getPrecision()) {
        case SINGLE: return DataTypes.FloatType;
        case DOUBLE: return DataTypes.DoubleType;
        default: throw new UnsupportedOperationException("half float");
      }
    }
    // Large* variants carry 8-byte offsets the fill path does not speak —
    // only library-written tables with explicit large types hit this
    if (t instanceof ArrowType.LargeUtf8 || t instanceof ArrowType.LargeBinary) {
      throw new UnsupportedOperationException(
          "quiverjvm: large_utf8/large_binary column '" + f.getName()
              + "': use the Python DataSource");
    }
    if (t instanceof ArrowType.Utf8) return DataTypes.StringType;
    if (t instanceof ArrowType.Binary) return DataTypes.BinaryType;
    if (t instanceof ArrowType.Bool) return DataTypes.BooleanType;
    if (t instanceof ArrowType.Date) return DataTypes.DateType;
    if (t instanceof ArrowType.Timestamp) {
      ArrowType.Timestamp ts = (ArrowType.Timestamp) t;
      if (ts.getUnit() != org.apache.arrow.vector.types.TimeUnit.MICROSECOND) {
        throw new UnsupportedOperationException("timestamp unit " + ts.getUnit());
      }
      return ts.getTimezone() == null ? DataTypes.TimestampNTZType : DataTypes.TimestampType;
    }
    if (t instanceof ArrowType.Decimal) {
      ArrowType.Decimal d = (ArrowType.Decimal) t;
      if (d.getBitWidth() != 128) {
        throw new UnsupportedOperationException("decimal" + d.getBitWidth());
      }
      return DataTypes.createDecimalType(d.getPrecision(), d.getScale());
    }
    throw new UnsupportedOperationException(
        "quiverjvm: column '" + f.getName() + "' type " + t
            + " (nested/extended types): use the Python 'quiver' DataSource");
  }

  static StructType toSparkSchema(Schema arrow) {
    StructType st = new StructType();
    for (Field f : arrow.getFields()) {
      st = st.add(f.getName(), sparkType(f), f.isNullable());
    }
    return st;
  }

  // ---- planning ----------------------------------------------------------

  /** One contiguous page range of one file inside a partition. */
  static final class Chunk implements Serializable {
    private static final long serialVersionUID = 1L;
    final String file;
    final int pageStart;
    final int pageEnd;

    Chunk(String file, int pageStart, int pageEnd) {
      this.file = file;
      this.pageStart = pageStart;
      this.pageEnd = pageEnd;
    }
  }

  static final class QuiverInputPartition implements InputPartition {
    private static final long serialVersionUID = 1L;
    final Chunk[] chunks;

    QuiverInputPartition(Chunk[] chunks) {
      this.chunks = chunks;
    }
  }

  // ---- scan builder / scan ----------------------------------------------

  static final class QuiverScanBuilder
      implements ScanBuilder, SupportsPushDownRequiredColumns,
          org.apache.spark.sql.connector.read.SupportsPushDownFilters {
    private final String path;
    private final StructType fullSchema;
    private StructType required;
    private org.apache.spark.sql.sources.Filter[] pushedForDisplay =
        new org.apache.spark.sql.sources.Filter[0];
    private List<QuiverPagePrune.Pred> preds = new ArrayList<>();

    QuiverScanBuilder(String path, StructType fullSchema) {
      this.path = path;
      this.fullSchema = fullSchema;
      this.required = fullSchema;
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      // Catalyst hands the pruned schema — the projection the Python DS
      // needs an explicit `columns` option for
      this.required = requiredSchema;
    }

    @Override
    public org.apache.spark.sql.sources.Filter[] pushFilters(
        org.apache.spark.sql.sources.Filter[] filters) {
      // zone-map pruning is ADVISORY: every filter is returned as residual
      // so Spark re-evaluates row-level above the scan (the Python DS
      // posture) — a pruned page is pure I/O saved, never a semantics bet
      List<org.apache.spark.sql.sources.Filter> display = new ArrayList<>();
      preds = new ArrayList<>();
      for (org.apache.spark.sql.sources.Filter f : filters) {
        QuiverPagePrune.Pred p = QuiverPagePrune.translate(f, fullSchema);
        if (p != null) {
          preds.add(p);
          display.add(f);
        }
      }
      pushedForDisplay = display.toArray(new org.apache.spark.sql.sources.Filter[0]);
      return filters;
    }

    @Override
    public org.apache.spark.sql.sources.Filter[] pushedFilters() {
      return pushedForDisplay;
    }

    @Override
    public Scan build() {
      return new QuiverScan(path, fullSchema, required, preds);
    }
  }

  static final class QuiverScan implements Scan, Batch {
    private final String path;
    private final StructType fullSchema;
    private final StructType required;
    private final List<QuiverPagePrune.Pred> preds;

    QuiverScan(String path, StructType fullSchema, StructType required,
        List<QuiverPagePrune.Pred> preds) {
      this.path = path;
      this.fullSchema = fullSchema;
      this.required = required;
      this.preds = preds;
    }

    @Override
    public StructType readSchema() {
      return required;
    }

    @Override
    public String description() {
      return "quiverjvm scan of " + path
          + (preds.isEmpty() ? "" : " pagePrune: " + preds);
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      try {
        String root = resolveRoot(path);
        com.fasterxml.jackson.databind.JsonNode man = readManifestRaw(root);
        guardManifestNode(man);
        List<File> files = new ArrayList<>();
        listFiles(new File(root), files);
        if (files.isEmpty()) return new InputPartition[0];

        // projected per-page bytes per file (leaf i == field i: flat only).
        // Manifest-served when possible: ONE directory-level metadata read
        // plans the whole table — the O(files) footer storm is the known
        // scale-killer (round-8/9, Python planner); any missing/stale
        // entry falls back to that file's footer, never to wrong ranges.
        int[] projIdx = projectionIndexes(fullSchema, required);
        java.nio.file.Path rootP = new File(root).toPath();
        com.fasterxml.jackson.databind.JsonNode manFiles =
            man == null ? null : man.get("files");
        List<long[]> perFilePageBytes = new ArrayList<>();
        List<boolean[]> perFileKeep = new ArrayList<>();
        long totalBytes = 0;
        for (File f : files) {
          String rel = rootP.relativize(f.toPath()).toString().replace(File.separatorChar, '/');
          long[] pb = manifestPageBytes(man, rel, f.length(), projIdx);
          if (pb == null) {
            PLAN_FOOTER_READS.incrementAndGet();
            Footer ft = readFooter(f);
            int nPages = ft.cols.length == 0 ? 0 : ft.cols[0].pages.length;
            pb = new long[nPages];
            for (int idx : (projIdx.length > 0 ? projIdx : new int[] {0})) {
              if (idx >= ft.cols.length) continue;
              PageMeta[] pages = ft.cols[idx].pages;
              for (int p = 0; p < Math.min(nPages, pages.length); p++) {
                pb[p] += pages[p].length;
              }
            }
          }
          // zone-map page pruning: sidecar stats ride the manifest entry
          // (zero extra I/O) or the on-disk .stats.json; a page is dropped
          // ONLY when no row can satisfy a pushed predicate
          boolean[] keep = null;
          if (!preds.isEmpty()) {
            QuiverPagePrune.FileStats st = QuiverPagePrune.loadStats(
                manFiles == null ? null : manFiles.get(rel), f);
            keep = QuiverPagePrune.keepMask(st, preds, pb.length);
          }
          perFilePageBytes.add(pb);
          perFileKeep.add(keep);
          for (int p = 0; p < pb.length; p++) {
            if (keep == null || keep[p]) totalBytes += pb[p];
            else PAGES_PRUNED.incrementAndGet();
          }
        }
        int parallelism = 8;
        try {
          parallelism = org.apache.spark.sql.SparkSession.active()
              .sparkContext().defaultParallelism();
        } catch (Exception ignore) {
        }
        long floor = Math.min(
            Math.max(totalBytes / Math.max(parallelism, 1), 1L << 20), 128L << 20);

        // roll page ranges into partitions under the floor, packing across
        // files (the Python planner's round-9 posture)
        List<InputPartition> parts = new ArrayList<>();
        List<Chunk> open = new ArrayList<>();
        long acc = 0;
        for (int fi = 0; fi < files.size(); fi++) {
          long[] pb = perFilePageBytes.get(fi);
          boolean[] keep = perFileKeep.get(fi);
          String fp = files.get(fi).getPath();
          int runStart = -1; // start of the current kept run
          for (int p = 0; p < pb.length; p++) {
            if (keep != null && !keep[p]) {
              if (runStart >= 0) {
                open.add(new Chunk(fp, runStart, p));
                runStart = -1;
              }
              continue;
            }
            if (runStart < 0) runStart = p;
            acc += pb[p];
            if (acc >= floor) {
              open.add(new Chunk(fp, runStart, p + 1));
              parts.add(new QuiverInputPartition(open.toArray(new Chunk[0])));
              open = new ArrayList<>();
              runStart = -1;
              acc = 0;
            }
          }
          if (runStart >= 0) {
            open.add(new Chunk(fp, runStart, pb.length));
          } else if (pb.length == 0) {
            open.add(new Chunk(fp, 0, 0));
          }
        }
        if (!open.isEmpty()) {
          parts.add(new QuiverInputPartition(open.toArray(new Chunk[0])));
        }
        return parts.toArray(new InputPartition[0]);
      } catch (IOException e) {
        throw new RuntimeException(e);
      }
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new QuiverReaderFactory(fullSchema.json(), required.json());
    }
  }

  static int[] projectionIndexes(StructType full, StructType required) {
    int[] out = new int[required.fields().length];
    for (int i = 0; i < required.fields().length; i++) {
      out[i] = full.fieldIndex(required.fields()[i].name());
    }
    return out;
  }

  // ---- reader ------------------------------------------------------------

  static final class QuiverReaderFactory implements PartitionReaderFactory {
    private static final long serialVersionUID = 1L;
    private final String fullSchemaJson;
    private final String requiredSchemaJson;

    QuiverReaderFactory(String fullSchemaJson, String requiredSchemaJson) {
      this.fullSchemaJson = fullSchemaJson;
      this.requiredSchemaJson = requiredSchemaJson;
    }

    @Override
    public boolean supportColumnarReads(InputPartition partition) {
      return true;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      throw new UnsupportedOperationException("columnar only");
    }

    @Override
    public PartitionReader<ColumnarBatch> createColumnarReader(InputPartition partition) {
      StructType full = (StructType) DataType.fromJson(fullSchemaJson);
      StructType required = (StructType) DataType.fromJson(requiredSchemaJson);
      return new QuiverColumnarReader(((QuiverInputPartition) partition).chunks, full, required);
    }
  }

  static final class QuiverColumnarReader implements PartitionReader<ColumnarBatch> {
    private final Chunk[] chunks;
    private final StructType full;
    private final StructType required;
    private final int[] projIdx;

    private int chunkI = 0;
    private int pageI = 0; // within current chunk's range
    private RandomAccessFile raf;
    private Footer footer;
    private long[][] pageOffsets; // per full-schema column: absolute offset of each page
    private ColumnarBatch batch;

    QuiverColumnarReader(Chunk[] chunks, StructType full, StructType required) {
      this.chunks = chunks;
      this.full = full;
      this.required = required;
      this.projIdx = projectionIndexes(full, required);
    }

    private void openChunk(Chunk c) throws IOException {
      closeFile();
      raf = new RandomAccessFile(new File(c.file), "r");
      footer = readFooter(new File(c.file));
      // projection indexes were computed against the TABLE schema; a file
      // whose column order/names differ (foreign file dropped into the
      // directory) would be silently misread through those indexes
      List<Field> fields = footer.arrowSchema.getFields();
      if (fields.size() != full.fields().length) {
        throw new IOException(
            "quiverjvm: file schema width " + fields.size() + " != table width "
                + full.fields().length + " in " + c.file
                + " (heterogeneous table: use the Python 'quiver' DataSource)");
      }
      for (int i = 0; i < fields.size(); i++) {
        if (!fields.get(i).getName().equals(full.fields()[i].name())) {
          throw new IOException(
              "quiverjvm: file column " + i + " is '" + fields.get(i).getName()
                  + "' but table expects '" + full.fields()[i].name() + "' in " + c.file
                  + " (heterogeneous table: use the Python 'quiver' DataSource)");
        }
      }
      pageOffsets = new long[footer.cols.length][];
      for (int ci = 0; ci < footer.cols.length; ci++) {
        PageMeta[] pages = footer.cols[ci].pages;
        long[] offs = new long[pages.length + 1];
        offs[0] = footer.cols[ci].offset;
        for (int p = 0; p < pages.length; p++) {
          offs[p + 1] = offs[p] + pages[p].length;
        }
        pageOffsets[ci] = offs;
      }
      pageI = c.pageStart;
    }

    @Override
    public boolean next() throws IOException {
      while (true) {
        if (chunkI >= chunks.length) return false;
        Chunk c = chunks[chunkI];
        if (raf == null) openChunk(c);
        if (pageI >= c.pageEnd || footer.cols.length == 0) {
          closeFile();
          chunkI++;
          continue;
        }
        batch = decodePage(c, pageI);
        pageI++;
        return true;
      }
    }

    @Override
    public ColumnarBatch get() {
      return batch;
    }

    private ColumnarBatch decodePage(Chunk c, int p) throws IOException {
      int rows = (int) footer.cols[0].pages[p].numValues;
      OnHeapColumnVector[] vecs = OnHeapColumnVector.allocateColumns(Math.max(rows, 1), required);
      for (int out = 0; out < projIdx.length; out++) {
        int ci = projIdx[out];
        PageMeta pm = footer.cols[ci].pages[p];
        byte[] page = new byte[(int) pm.length];
        raf.seek(pageOffsets[ci][p]);
        raf.readFully(page);
        fillVector(vecs[out], page, rows, full.fields()[ci]);
      }
      return new ColumnarBatch(vecs, rows);
    }

    private void fillVector(OnHeapColumnVector vec, byte[] page, int rows, StructField field)
        throws IOException {
      QuiverPageDecoder.Cursor cur =
          new QuiverPageDecoder.Cursor(page, 0, page.length);
      boolean[] valid = null;
      if (field.nullable()) {
        valid = QuiverPageDecoder.readValidity(cur, rows);
      }
      DataType t = field.dataType();
      if (t == DataTypes.LongType || t == DataTypes.TimestampType || t == DataTypes.TimestampNTZType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 8);
        vec.putLongsLittleEndian(0, rows, raw, 0);
      } else if (t == DataTypes.IntegerType || t == DataTypes.DateType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 4);
        vec.putIntsLittleEndian(0, rows, raw, 0);
      } else if (t == DataTypes.DoubleType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 8);
        vec.putDoublesLittleEndian(0, rows, raw, 0);
      } else if (t == DataTypes.FloatType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 4);
        vec.putFloatsLittleEndian(0, rows, raw, 0);
      } else if (t == DataTypes.ShortType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 2);
        for (int i = 0; i < rows; i++) {
          vec.putShort(i, (short) QuiverPageDecoder.leLong(raw, i * 2, 2));
        }
      } else if (t == DataTypes.ByteType) {
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 1);
        vec.putBytes(0, rows, raw, 0);
      } else if (t == DataTypes.BooleanType) {
        boolean[] vals = QuiverPageDecoder.decodeBoolean(cur, rows);
        for (int i = 0; i < rows; i++) vec.putBoolean(i, vals[i]);
      } else if (t == DataTypes.StringType || t == DataTypes.BinaryType) {
        QuiverPageDecoder.Binary bin = QuiverPageDecoder.decodeBinary(cur, rows, 4);
        for (int i = 0; i < rows; i++) {
          int off = (int) bin.offsets[i];
          int len = (int) (bin.offsets[i + 1] - bin.offsets[i]);
          vec.putByteArray(i, bin.values, off, len);
        }
      } else if (t instanceof DecimalType) {
        DecimalType dt = (DecimalType) t;
        byte[] raw = QuiverPageDecoder.decodeValues(cur, rows, 16);
        byte[] be = new byte[16];
        for (int i = 0; i < rows; i++) {
          for (int k = 0; k < 16; k++) be[k] = raw[i * 16 + (15 - k)];
          BigInteger unscaled = new BigInteger(be);
          vec.putDecimal(i, Decimal.apply(new BigDecimal(unscaled, dt.scale())), dt.precision());
        }
      } else {
        throw new UnsupportedOperationException("quiverjvm: type " + t);
      }
      if (valid != null) {
        for (int i = 0; i < rows; i++) {
          if (!valid[i]) vec.putNull(i);
        }
      }
    }

    private void closeFile() throws IOException {
      if (raf != null) {
        raf.close();
        raf = null;
      }
    }

    @Override
    public void close() throws IOException {
      closeFile();
    }
  }
}
