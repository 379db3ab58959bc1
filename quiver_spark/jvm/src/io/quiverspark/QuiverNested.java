package io.quiverspark;

import java.io.IOException;
import java.util.ArrayList;
import java.util.List;

import org.apache.arrow.vector.types.pojo.ArrowType;
import org.apache.arrow.vector.types.pojo.Field;
import org.apache.arrow.vector.types.pojo.Schema;
import org.apache.spark.sql.execution.vectorized.WritableColumnVector;

/**
 * Dremel rep/def machinery for the JVM scan's nested-column support —
 * byte-compatible with the Python shredder/assembler
 * (quiver_spark/format/nested.py) and the reference's NestedState level
 * reconstruction (/root/reference/src/read/read_basic.rs:65-173, nested
 * round-trip matrix tests/it/io.rs:167-278).
 *
 * A nested column stores one parquet-style leaf per primitive of its type
 * tree, each page laid out as
 * `rows u32 | rep_len u32 | def_len u32 | rep | def | values` where the
 * levels use the same hybrid-RLE encoding as flat validity generalized to
 * ceil(log2(max_level+1)) bits and `values` is the ordinary typed codec
 * cascade over PRESENT leaf values only (leaf nulls live in the def
 * levels). Assembly rebuilds list/struct/map/fixed-size-list structure
 * directly into Spark {@link WritableColumnVector} children, so nested
 * scans stay on the columnar fast path.
 *
 * Level semantics (parquet): each OPTIONAL node adds one def level counted
 * when the value is non-null; each REPEATED node (list / map /
 * fixed-size-list) adds one rep depth and one def level counted per
 * existing element. "Entries" of a node at rep depth r are, in any of its
 * leaves' slot arrays, the slots with rep <= r — exactly one per logical
 * position including null/empty-ancestor placeholders; sibling leaves
 * under a struct have different slot counts but identical entry sequences,
 * which is what lets recursion pass a boolean entry selection down.
 */
final class QuiverNested {

  private QuiverNested() {}

  // ---- schema walking ------------------------------------------------------

  static boolean isNested(ArrowType t) {
    return t instanceof ArrowType.List
        || t instanceof ArrowType.LargeList
        || t instanceof ArrowType.FixedSizeList
        || t instanceof ArrowType.Struct
        || t instanceof ArrowType.Map;
  }

  /** Number of primitive leaves under a field (1 for a flat field). */
  static int countLeaves(Field f) {
    ArrowType t = f.getType();
    if (t instanceof ArrowType.List || t instanceof ArrowType.LargeList
        || t instanceof ArrowType.FixedSizeList) {
      return countLeaves(f.getChildren().get(0));
    }
    if (t instanceof ArrowType.Map) {
      Field entries = f.getChildren().get(0);
      return countLeaves(entries.getChildren().get(0))
          + countLeaves(entries.getChildren().get(1));
    }
    if (t instanceof ArrowType.Struct) {
      int n = 0;
      for (Field c : f.getChildren()) n += countLeaves(c);
      return n;
    }
    return 1;
  }

  /** Per top-level field: {first leaf meta index, leaf count} — the
   * reader's map from schema position to footer/manifest meta positions
   * (Python twin: format/reader.py column_leaf_ranges). */
  static int[][] leafRanges(Schema arrow) {
    List<Field> fields = arrow.getFields();
    int[][] out = new int[fields.size()][2];
    int pos = 0;
    for (int i = 0; i < fields.size(); i++) {
      int cnt = countLeaves(fields.get(i));
      out[i][0] = pos;
      out[i][1] = cnt;
      pos += cnt;
    }
    return out;
  }

  /** (maxRep, maxDef, leaf field) per leaf in shred order — derivable from
   * the schema alone (Python twin: nested.py leaf_specs). */
  static final class LeafSpec {
    final int maxRep;
    final int maxDef;
    final Field field;

    LeafSpec(int maxRep, int maxDef, Field field) {
      this.maxRep = maxRep;
      this.maxDef = maxDef;
      this.field = field;
    }
  }

  static List<LeafSpec> leafSpecs(Field top) {
    List<LeafSpec> out = new ArrayList<>();
    walkSpecs(top, top.isNullable(), 0, 0, out);
    return out;
  }

  private static void walkSpecs(Field f, boolean nullable, int rep, int def,
      List<LeafSpec> out) {
    ArrowType t = f.getType();
    def += nullable ? 1 : 0;
    if (t instanceof ArrowType.Struct) {
      for (Field c : f.getChildren()) {
        walkSpecs(c, c.isNullable(), rep, def, out);
      }
    } else if (t instanceof ArrowType.List || t instanceof ArrowType.LargeList
        || t instanceof ArrowType.FixedSizeList) {
      Field elem = f.getChildren().get(0);
      walkSpecs(elem, elem.isNullable(), rep + 1, def + 1, out);
    } else if (t instanceof ArrowType.Map) {
      Field entries = f.getChildren().get(0);
      Field k = entries.getChildren().get(0);
      Field v = entries.getChildren().get(1);
      walkSpecs(k, false, rep + 1, def + 1, out);
      walkSpecs(v, v.isNullable(), rep + 1, def + 1, out);
    } else {
      out.add(new LeafSpec(rep, def, f));
    }
  }

  // ---- level decode ----------------------------------------------------------

  static int bitsFor(int maxLevel) {
    return Math.max(1, 32 - Integer.numberOfLeadingZeros(Math.max(maxLevel, 1)));
  }

  /** Hybrid-RLE level stream → int[n] (Python twin: nested.decode_levels;
   * empty buffer = all-zero levels, the zero-width parquet convention). */
  static int[] decodeLevels(byte[] a, int off, int len, int n, int width) {
    int[] out = new int[n];
    int pos = off;
    int end = off + len;
    int count = 0;
    while (count < n && pos < end) {
      long header = 0;
      int shift = 0;
      while (true) {
        int b = a[pos++] & 0xFF;
        header |= (long) (b & 0x7F) << shift;
        if ((b & 0x80) == 0) break;
        shift += 7;
      }
      if ((header & 1) != 0) { // bitpacked: (header>>1) groups of 8 values
        int groups = (int) (header >> 1);
        int take = Math.min(groups * 8, n - count);
        for (int i = 0; i < take; i++) {
          int bitPos = i * width;
          int v = 0;
          for (int b = 0; b < width; b++) {
            int bp = bitPos + b;
            v |= ((a[pos + (bp >> 3)] >> (bp & 7)) & 1) << b;
          }
          out[count + i] = v;
        }
        count += take;
        pos += groups * width;
      } else { // RLE: (header>>1) repeats of a width-byte-padded value
        int run = (int) (header >> 1);
        int nbytes = (width + 7) / 8;
        int v = 0;
        for (int b = 0; b < nbytes; b++) v |= (a[pos + b] & 0xFF) << (8 * b);
        pos += nbytes;
        int take = Math.min(run, n - count);
        java.util.Arrays.fill(out, count, count + take, v);
        count += take;
      }
    }
    return out;
  }

  // ---- decoded leaf ----------------------------------------------------------

  /** One leaf's decoded page: slot-level rep/def plus PRESENT values in
   * whichever representation the leaf type uses. */
  static final class DLeaf {
    int[] rep;
    int[] def;
    int maxRep;
    int maxDef;
    Field field;
    int nPresent;
    byte[] fixed; // fixed-width values, little-endian (numeric/decimal)
    int width;
    QuiverPageDecoder.Binary bin; // utf8/binary
    boolean[] bools;
  }

  /** Decode one nested leaf page (`rows u32 | rep_len | def_len | rep |
   * def | values`); nSlots is the page meta's num_values (the level
   * count). Returns the decoded leaf plus the page's row count in
   * rowsOut[0]. */
  static DLeaf decodeLeafPage(byte[] page, int nSlots, LeafSpec spec, int[] rowsOut)
      throws IOException {
    QuiverPageDecoder.Cursor cur = new QuiverPageDecoder.Cursor(page, 0, page.length);
    rowsOut[0] = cur.u32();
    int repLen = cur.u32();
    int defLen = cur.u32();
    DLeaf lf = new DLeaf();
    lf.maxRep = spec.maxRep;
    lf.maxDef = spec.maxDef;
    lf.field = spec.field;
    lf.rep = decodeLevels(page, cur.pos, repLen, nSlots, bitsFor(spec.maxRep));
    cur.pos += repLen;
    lf.def = decodeLevels(page, cur.pos, defLen, nSlots, bitsFor(spec.maxDef));
    cur.pos += defLen;
    int present = 0;
    for (int i = 0; i < nSlots; i++) {
      if (lf.def[i] >= spec.maxDef) present++;
    }
    lf.nPresent = present;

    ArrowType t = spec.field.getType();
    if (t instanceof ArrowType.Bool) {
      lf.bools = QuiverPageDecoder.decodeBoolean(cur, present);
    } else if (t instanceof ArrowType.Utf8 || t instanceof ArrowType.Binary) {
      lf.bin = QuiverPageDecoder.decodeBinary(cur, present, 4);
    } else if (t instanceof ArrowType.LargeUtf8 || t instanceof ArrowType.LargeBinary) {
      lf.bin = QuiverPageDecoder.decodeBinary(cur, present, 8);
    } else {
      lf.width = fixedWidth(t);
      lf.fixed = QuiverPageDecoder.decodeValues(cur, present, lf.width);
    }
    return lf;
  }

  static int fixedWidth(ArrowType t) {
    if (t instanceof ArrowType.Int) {
      return ((ArrowType.Int) t).getBitWidth() / 8;
    }
    if (t instanceof ArrowType.FloatingPoint) {
      switch (((ArrowType.FloatingPoint) t).getPrecision()) {
        case SINGLE: return 4;
        case DOUBLE: return 8;
        default: throw new UnsupportedOperationException("half float leaf");
      }
    }
    if (t instanceof ArrowType.Date) return 4;
    if (t instanceof ArrowType.Timestamp) return 8;
    if (t instanceof ArrowType.Decimal) {
      return ((ArrowType.Decimal) t).getBitWidth() / 8;
    }
    throw new UnsupportedOperationException("quiverjvm: nested leaf type " + t);
  }

  // ---- assembly --------------------------------------------------------------

  /** Rebuild one nested top-level column for one page into `out`
   * (capacity ≥ rows). Leaves are the column's decoded leaf pages in
   * shred order. */
  static void assembleColumn(Field top, DLeaf[] leaves, WritableColumnVector out,
      int rows) {
    boolean[] allSel = new boolean[rows];
    java.util.Arrays.fill(allSel, true);
    int consumed = assemble(top, top.isNullable(), leaves, 0, allSel, 0, 0, out);
    if (consumed != leaves.length) {
      throw new IllegalStateException(
          "quiverjvm: nested assembly consumed " + consumed + " of " + leaves.length
              + " leaves of column '" + top.getName() + "'");
    }
  }

  /** Entry slots of the node rooted at leaves[leafPos] for rep depth
   * curRep: slot indices with rep <= curRep. */
  private static int[] entrySlots(DLeaf lf, int curRep) {
    int n = 0;
    for (int i = 0; i < lf.rep.length; i++) {
      if (lf.rep[i] <= curRep) n++;
    }
    int[] out = new int[n];
    int w = 0;
    for (int i = 0; i < lf.rep.length; i++) {
      if (lf.rep[i] <= curRep) out[w++] = i;
    }
    return out;
  }

  /** Write one value per SELECTED entry into out[0..nSel); returns the
   * next leaf position (Python twin: nested._assemble_node). */
  private static int assemble(Field f, boolean nullable, DLeaf[] leaves, int leafPos,
      boolean[] entrySel, int curRep, int curDef, WritableColumnVector out) {
    DLeaf lf = leaves[leafPos];
    ArrowType t = f.getType();
    if (nullable) curDef++;

    if (t instanceof ArrowType.Struct) {
      int[] slots = entrySlots(lf, curRep);
      int nSel = 0;
      for (boolean b : entrySel) { if (b) nSel++; }
      out.reserve(Math.max(nSel, 1));
      int pos = leafPos;
      List<Field> children = f.getChildren();
      for (int i = 0; i < children.size(); i++) {
        Field c = children.get(i);
        pos = assemble(c, c.isNullable(), leaves, pos, entrySel, curRep, curDef,
            out.getChild(i));
      }
      if (nullable) {
        int j = 0;
        for (int e = 0; e < slots.length; e++) {
          if (!entrySel[e]) continue;
          if (lf.def[slots[e]] < curDef) out.putNull(j);
          j++;
        }
      }
      return pos;
    }

    boolean isMap = t instanceof ArrowType.Map;
    boolean isRepeated = isMap || t instanceof ArrowType.List
        || t instanceof ArrowType.LargeList || t instanceof ArrowType.FixedSizeList;
    if (isRepeated) {
      int elemDef = curDef + 1;
      int[] slots = entrySlots(lf, curRep);
      int nSel = 0;
      for (boolean b : entrySel) { if (b) nSel++; }
      out.reserve(Math.max(nSel, 1));

      // child entries: slots with rep <= curRep+1 — one per element plus
      // one placeholder per empty/null/absent parent. Map each to its
      // parent entry and keep only real elements of selected parents.
      int nChild = 0;
      for (int i = 0; i < lf.rep.length; i++) {
        if (lf.rep[i] <= curRep + 1) nChild++;
      }
      boolean[] childSel = new boolean[nChild];
      int[] counts = new int[slots.length]; // elements per parent entry
      int parent = -1;
      int k = 0;
      for (int i = 0; i < lf.rep.length; i++) {
        if (lf.rep[i] > curRep + 1) continue;
        if (lf.rep[i] <= curRep) parent++;
        boolean isElem = lf.def[i] >= elemDef;
        if (isElem) {
          counts[parent]++;
          childSel[k] = entrySel[parent];
        }
        k++;
      }

      int pos;
      if (isMap) {
        Field entries = f.getChildren().get(0);
        Field keyF = entries.getChildren().get(0);
        Field valF = entries.getChildren().get(1);
        pos = assemble(keyF, false, leaves, leafPos, childSel, curRep + 1, elemDef,
            out.getChild(0));
        pos = assemble(valF, valF.isNullable(), leaves, pos, childSel, curRep + 1,
            elemDef, out.getChild(1));
      } else {
        Field elemF = f.getChildren().get(0);
        pos = assemble(elemF, elemF.isNullable(), leaves, leafPos, childSel,
            curRep + 1, elemDef, out.getChild(0));
      }

      int running = 0;
      int j = 0;
      for (int e = 0; e < slots.length; e++) {
        if (!entrySel[e]) continue;
        out.putArray(j, running, counts[e]);
        running += counts[e];
        if (nullable && lf.def[slots[e]] < curDef) out.putNull(j);
        j++;
      }
      return pos;
    }

    // primitive leaf: every slot is an entry (curRep == maxRep here);
    // validity comes from the leaf's own max def, which also covers
    // non-nullable leaves under null ancestors.
    int[] def = lf.def;
    int nSel = 0;
    for (boolean b : entrySel) { if (b) nSel++; }
    out.reserve(Math.max(nSel, 1));
    int rank = -1; // running index into present values
    int j = 0;
    for (int s = 0; s < def.length; s++) {
      boolean present = def[s] >= lf.maxDef;
      if (present) rank++;
      if (!entrySel[s]) continue;
      if (!present) {
        out.putNull(j);
      } else {
        putLeafValue(out, j, lf, rank);
      }
      j++;
    }
    return leafPos + 1;
  }

  private static void putLeafValue(WritableColumnVector out, int j, DLeaf lf, int v) {
    ArrowType t = lf.field.getType();
    if (lf.bin != null) {
      int off = (int) lf.bin.offsets[v];
      int len = (int) (lf.bin.offsets[v + 1] - lf.bin.offsets[v]);
      out.putByteArray(j, lf.bin.values, off, len);
      return;
    }
    if (lf.bools != null) {
      out.putBoolean(j, lf.bools[v]);
      return;
    }
    long raw = lf.width <= 8 ? QuiverPageDecoder.leLong(lf.fixed, v * lf.width, lf.width) : 0;
    if (t instanceof ArrowType.Int) {
      ArrowType.Int it = (ArrowType.Int) t;
      if (!it.getIsSigned()) {
        // unsigned widening (leLong zero-extends): uint8→short,
        // uint16→int, uint32→long, uint64→decimal(20,0)
        switch (it.getBitWidth()) {
          case 8: out.putShort(j, (short) raw); return;
          case 16: out.putInt(j, (int) raw); return;
          case 32: out.putLong(j, raw); return;
          default:
            java.math.BigDecimal bd = new java.math.BigDecimal(
                new java.math.BigInteger(Long.toUnsignedString(raw)));
            out.putDecimal(j, org.apache.spark.sql.types.Decimal.apply(bd), 20);
            return;
        }
      }
      switch (it.getBitWidth()) {
        case 8: out.putByte(j, (byte) raw); return;
        case 16: out.putShort(j, (short) raw); return;
        case 32: out.putInt(j, (int) raw); return;
        default: out.putLong(j, raw); return;
      }
    }
    if (t instanceof ArrowType.FloatingPoint) {
      if (lf.width == 4) out.putFloat(j, Float.intBitsToFloat((int) raw));
      else out.putDouble(j, Double.longBitsToDouble(raw));
      return;
    }
    if (t instanceof ArrowType.Date) {
      out.putInt(j, (int) raw);
      return;
    }
    if (t instanceof ArrowType.Timestamp) {
      // file-unit ticks → Spark us (round-13 lift, pyarrow safe-cast parity)
      out.putLong(j, QuiverJvmRead.toMicros(raw, ((ArrowType.Timestamp) t).getUnit()));
      return;
    }
    if (t instanceof ArrowType.Decimal) {
      ArrowType.Decimal d = (ArrowType.Decimal) t;
      byte[] be = new byte[lf.width];
      for (int b = 0; b < lf.width; b++) be[b] = lf.fixed[v * lf.width + (lf.width - 1 - b)];
      java.math.BigInteger unscaled = new java.math.BigInteger(be);
      out.putDecimal(j,
          org.apache.spark.sql.types.Decimal.apply(
              new java.math.BigDecimal(unscaled, d.getScale())),
          d.getPrecision());
      return;
    }
    throw new UnsupportedOperationException("quiverjvm: nested leaf type " + t);
  }
}
