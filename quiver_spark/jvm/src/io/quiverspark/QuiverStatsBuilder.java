package io.quiverspark;

import java.nio.charset.StandardCharsets;
import java.util.Set;

import com.fasterxml.jackson.databind.ObjectMapper;
import com.fasterxml.jackson.databind.node.ArrayNode;
import com.fasterxml.jackson.databind.node.ObjectNode;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.ByteType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DateType;
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
 * Sidecar statistics for JVM-written quiver files — the same
 * `<file>.stats.json` layout the Python writer emits
 * (format/stats.py::build_file_stats, version 1), so JVM-ingested tables
 * get zone-map pruning, bloom point-lookup skipping, and CRC verification
 * on BOTH engines. Stored domains match page_stats exactly:
 * - numeric/temporal: JSON numbers in the physical domain (epoch days /
 *   unit ticks); pages containing NaN or ±Inf get null stats (never
 *   pruned — Python json emits bare Infinity, which Jackson would not);
 * - strings: min is a 64-CODE-POINT prefix (valid lower bound), max null
 *   when truncation would break the upper bound; byte-wise UTF-8
 *   comparison == code-point order, the Python reader's domain;
 * - booleans: JSON booleans;
 * - decimal/binary: null min/max (no stats, matching supports_stats),
 *   null counts still recorded so IS NULL pruning works.
 * Blooms (requested via the writer's `bloom_columns` option) follow
 * page_bloom: blake2b-128 double hashing, k=5, m = next power of two of
 * max(1024, 8·values) — byte-compatible with stats.py::bloom_may_contain.
 */
final class QuiverStatsBuilder {
  private QuiverStatsBuilder() {}

  private static final int STR_CAP = 64; // stats.py _STR_CAP
  private static final int BLOOM_K = 5;

  static String sidecarJson(
      StructType schema,
      Object[] cols,
      int pageSize,
      int nPages,
      long[][] pageCrcs,
      Set<String> bloomCols) {
    ObjectMapper om = new ObjectMapper();
    ObjectNode root = om.createObjectNode();
    root.put("version", 1);
    int n = cols.length > 0 ? QuiverFileEncoder.colRows(cols[0]) : 0;
    ArrayNode pageRows = root.putArray("page_rows");
    for (int p = 0; p < nPages; p++) {
      pageRows.add(Math.min(pageSize, Math.max(n - p * pageSize, 0)));
    }
    ObjectNode columns = root.putObject("columns");
    StructField[] fields = schema.fields();
    for (int ci = 0; ci < cols.length; ci++) {
      if (!(cols[ci] instanceof QuiverFileEncoder.ColBuf)) {
        // nested columns: no value stats (Python-writer parity: null
        // min/max), but REAL top-level null counts so IS NULL /
        // IS NOT NULL page pruning fires
        QuiverNestedWrite.NestedColBuf nb = (QuiverNestedWrite.NestedColBuf) cols[ci];
        ObjectNode nNode = columns.putObject(fields[ci].name());
        ArrayNode nMins = nNode.putArray("min");
        ArrayNode nMaxs = nNode.putArray("max");
        ArrayNode nNulls = nNode.putArray("nulls");
        ArrayNode nSums = nNode.putArray("sum");
        for (int p = 0; p < nPages; p++) {
          int r0 = p * pageSize;
          int r1 = Math.min(r0 + pageSize, n);
          nMins.addNull();
          nMaxs.addNull();
          nNulls.add(nb.nullsInRange(r0, Math.max(r1, r0)));
          nSums.addNull();
        }
        continue;
      }
      QuiverFileEncoder.ColBuf col = (QuiverFileEncoder.ColBuf) cols[ci];
      ObjectNode colNode = columns.putObject(fields[ci].name());
      ArrayNode mins = colNode.putArray("min");
      ArrayNode maxs = colNode.putArray("max");
      ArrayNode nulls = colNode.putArray("nulls");
      ArrayNode sums = colNode.putArray("sum");
      for (int p = 0; p < nPages; p++) {
        int start = p * pageSize;
        int len = Math.min(pageSize, Math.max(n - start, 0));
        addPageStats(mins, maxs, nulls, sums, col, fields[ci].dataType(), start, len);
      }
      if (bloomCols.contains(fields[ci].name())
          && bloomable(fields[ci].dataType())) {
        ObjectNode bl = colNode.putObject("bloom");
        bl.put("k", BLOOM_K);
        ArrayNode pages = bl.putArray("pages");
        for (int p = 0; p < nPages; p++) {
          int start = p * pageSize;
          int len = Math.min(pageSize, Math.max(n - start, 0));
          String b64 = pageBloom(col, fields[ci].dataType(), start, len);
          if (b64 == null) pages.addNull();
          else pages.add(b64);
        }
      }
    }
    ArrayNode crcs = root.putArray("page_crc32");
    for (long[] perCol : pageCrcs) {
      ArrayNode one = crcs.addArray();
      for (long c : perCol) one.add(c);
    }
    try {
      return om.writeValueAsString(root);
    } catch (com.fasterxml.jackson.core.JsonProcessingException e) {
      throw new RuntimeException(e);
    }
  }

  // ---- per-page min/max/nulls ---------------------------------------------

  private static void addPageStats(
      ArrayNode mins, ArrayNode maxs, ArrayNode nulls, ArrayNode sums,
      QuiverFileEncoder.ColBuf col, DataType t, int start, int len) {
    int nNull = 0;
    if (col.valid != null) {
      for (int i = start; i < start + len; i++) {
        if (!col.valid[i]) nNull++;
      }
    }
    nulls.add(nNull);
    if (len == 0 || nNull == len) {
      mins.addNull();
      maxs.addNull();
      sums.addNull();
      return;
    }
    if (t instanceof LongType || t instanceof TimestampType || t instanceof TimestampNTZType
        || t instanceof IntegerType || t instanceof DateType
        || t instanceof ShortType || t instanceof ByteType) {
      long lo = Long.MAX_VALUE;
      long hi = Long.MIN_VALUE;
      // page sums only for PURE ints (SUM over dates/timestamps is not
      // SQL; Python-writer parity) — overflow stores null, which simply
      // refuses the pushed-SUM aggregate for this file
      boolean wantSum = t instanceof LongType || t instanceof IntegerType
          || t instanceof ShortType || t instanceof ByteType;
      long sum = 0;
      boolean overflow = false;
      for (int i = start; i < start + len; i++) {
        if (col.valid != null && !col.valid[i]) continue;
        long v = readIntegral(col, i, t);
        if (v < lo) lo = v;
        if (v > hi) hi = v;
        if (wantSum && !overflow) {
          try {
            sum = Math.addExact(sum, v);
          } catch (ArithmeticException e) {
            overflow = true;
          }
        }
      }
      mins.add(lo);
      maxs.add(hi);
      if (wantSum && !overflow) sums.add(sum);
      else sums.addNull();
      return;
    }
    if (t instanceof DoubleType || t instanceof FloatType) {
      double lo = Double.POSITIVE_INFINITY;
      double hi = Double.NEGATIVE_INFINITY;
      for (int i = start; i < start + len; i++) {
        if (col.valid != null && !col.valid[i]) continue;
        double v;
        if (t instanceof DoubleType) {
          v = Double.longBitsToDouble(leLong(col.values.a, i * 8, 8));
        } else {
          v = Float.intBitsToFloat((int) leLong(col.values.a, i * 4, 4));
        }
        if (Double.isNaN(v)) {
          // pages with any NaN get null stats — Spark orders NaN above
          // every value, so a finite max would mis-prune gt/gte/eq
          mins.addNull();
          maxs.addNull();
          sums.addNull();
          return;
        }
        if (v < lo) lo = v;
        if (v > hi) hi = v;
      }
      if (Double.isInfinite(lo) || Double.isInfinite(hi)) {
        // Python json emits bare Infinity (non-standard); rather than
        // match that quirk, store null (kept page) — pruning-neutral
        mins.addNull();
        maxs.addNull();
        sums.addNull();
        return;
      }
      mins.add(lo);
      maxs.add(hi);
      sums.addNull();
      return;
    }
    if (t instanceof BooleanType) {
      boolean lo = true;
      boolean hi = false;
      for (int i = start; i < start + len; i++) {
        if (col.valid != null && !col.valid[i]) continue;
        boolean v = col.bools[i];
        lo = lo && v;
        hi = hi || v;
      }
      mins.add(lo);
      maxs.add(hi);
      sums.addNull();
      return;
    }
    if (t instanceof StringType) {
      int loIdx = -1;
      int hiIdx = -1;
      for (int i = start; i < start + len; i++) {
        if (col.valid != null && !col.valid[i]) continue;
        if (loIdx < 0 || utf8Cmp(col, i, loIdx) < 0) loIdx = i;
        if (hiIdx < 0 || utf8Cmp(col, i, hiIdx) > 0) hiIdx = i;
      }
      String lo = utf8At(col, loIdx);
      String hi = utf8At(col, hiIdx);
      mins.add(prefixCodePoints(lo, STR_CAP));
      if (hi.codePointCount(0, hi.length()) > STR_CAP) maxs.addNull();
      else maxs.add(hi);
      sums.addNull();
      return;
    }
    // decimal / binary: no ordered stats in the sidecar domain
    mins.addNull();
    maxs.addNull();
    sums.addNull();
  }

  private static long readIntegral(QuiverFileEncoder.ColBuf col, int i, DataType t) {
    if (t instanceof LongType || t instanceof TimestampType || t instanceof TimestampNTZType) {
      return leLong(col.values.a, i * 8, 8);
    }
    if (t instanceof IntegerType || t instanceof DateType) {
      return (int) leLong(col.values.a, i * 4, 4);
    }
    if (t instanceof ShortType) {
      return (short) leLong(col.values.a, i * 2, 2);
    }
    return (byte) leLong(col.values.a, i, 1);
  }

  private static long leLong(byte[] a, int off, int width) {
    long v = 0;
    for (int k = width - 1; k >= 0; k--) {
      v = (v << 8) | (a[off + k] & 0xFFL);
    }
    return v;
  }

  private static int utf8Cmp(QuiverFileEncoder.ColBuf col, int a, int b) {
    int sa = col.offsets[a];
    int ea = col.offsets[a + 1];
    int sb = col.offsets[b];
    int eb = col.offsets[b + 1];
    int la = ea - sa;
    int lb = eb - sb;
    int m = Math.min(la, lb);
    for (int k = 0; k < m; k++) {
      int d = (col.values.a[sa + k] & 0xFF) - (col.values.a[sb + k] & 0xFF);
      if (d != 0) return d;
    }
    return la - lb;
  }

  private static String utf8At(QuiverFileEncoder.ColBuf col, int i) {
    int s = col.offsets[i];
    return new String(col.values.a, s, col.offsets[i + 1] - s, StandardCharsets.UTF_8);
  }

  private static String prefixCodePoints(String s, int cap) {
    if (s.codePointCount(0, s.length()) <= cap) return s;
    return s.substring(0, s.offsetByCodePoints(0, cap));
  }

  // ---- blooms ---------------------------------------------------------------

  static boolean bloomable(DataType t) {
    return t instanceof LongType || t instanceof IntegerType || t instanceof ShortType
        || t instanceof ByteType || t instanceof DateType || t instanceof TimestampType
        || t instanceof TimestampNTZType || t instanceof StringType;
  }

  private static String pageBloom(
      QuiverFileEncoder.ColBuf col, DataType t, int start, int len) {
    int count = 0;
    for (int i = start; i < start + len; i++) {
      if (col.valid == null || col.valid[i]) count++;
    }
    long mBits = Math.max(1024L, 8L * Math.max(1, count));
    mBits = Long.highestOneBit(mBits - 1) << 1; // next power of two
    byte[] bits = new byte[(int) (mBits / 8)];
    for (int i = start; i < start + len; i++) {
      if (col.valid != null && !col.valid[i]) continue;
      byte[] key;
      if (t instanceof StringType) {
        key = ("s:" + utf8At(col, i)).getBytes(StandardCharsets.UTF_8);
      } else {
        key = ("i:" + readIntegral(col, i, t)).getBytes(StandardCharsets.US_ASCII);
      }
      byte[] d = Blake2b.digest(key, 16);
      long h1 = leLong(d, 0, 8);
      long h2 = leLong(d, 8, 8);
      for (int k = 0; k < BLOOM_K; k++) {
        long idx = (h1 + (long) k * h2) & (mBits - 1);
        bits[(int) (idx >>> 3)] |= (byte) (1 << (idx & 7));
      }
    }
    return java.util.Base64.getEncoder().encodeToString(bits);
  }
}
