package io.quiverspark;

import java.util.ArrayList;
import java.util.List;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.MapData;
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters;
import org.apache.spark.sql.types.ArrayType;
import org.apache.spark.sql.types.BinaryType;
import org.apache.spark.sql.types.BooleanType;
import org.apache.spark.sql.types.ByteType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.DateType;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.IntegerType;
import org.apache.spark.sql.types.LongType;
import org.apache.spark.sql.types.MapType;
import org.apache.spark.sql.types.Metadata;
import org.apache.spark.sql.types.ShortType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.types.TimestampNTZType;
import org.apache.spark.sql.types.TimestampType;

/**
 * Write-side Dremel shredder for the quiverjvm sink (round 12) — the
 * inverse of QuiverNested's read-side assembler and the byte-level twin
 * of the Python shredder (quiver_spark/format/nested.py shred +
 * encode_levels; reference write_nested_validity at
 * src/write/serialize.rs:217-232).
 *
 * A nested column accumulates one LeafW per primitive of its type tree;
 * every incoming row is shredded immediately (no tree buffering): each
 * leaf receives one (rep, def) slot per logical position — one per leaf
 * value, empty list, or null ancestor — plus the PRESENT values in its
 * flat ColBuf. Per-row cumulative slot/value counts let the file encoder
 * slice leaf pages on the same row boundaries as flat columns, emitting
 * the `rows u32 | rep | def | values` nested page layout with the same
 * typed codec cascade flat pages use.
 */
final class QuiverNestedWrite {

  private QuiverNestedWrite() {}

  /** Type-tree node with its leaf range and (maxRep, maxDef) context. */
  static final class Node {
    final DataType type;
    final boolean nullable;
    final Node[] children;
    final int leafLo;
    final int leafHi; // exclusive
    final int leafIdx; // for leaves only, else -1

    Node(DataType type, boolean nullable, Node[] children, int leafLo, int leafHi,
        int leafIdx) {
      this.type = type;
      this.nullable = nullable;
      this.children = children;
      this.leafLo = leafLo;
      this.leafHi = leafHi;
      this.leafIdx = leafIdx;
    }
  }

  /** One primitive leaf being accumulated: slot levels + present values. */
  static final class LeafW {
    final QuiverFileEncoder.ColBuf values;
    final DataType type;
    final int maxRep;
    final int maxDef;
    int[] rep = new int[1 << 10];
    int[] def = new int[1 << 10];
    int slots = 0;
    int[] slotEnd = new int[1 << 10]; // cumulative slots at each row end
    int[] presEnd = new int[1 << 10]; // cumulative present values at each row end
    int rows = 0;

    LeafW(DataType t, int maxRep, int maxDef) {
      this.type = t;
      this.maxRep = maxRep;
      this.maxDef = maxDef;
      this.values = new QuiverFileEncoder.ColBuf(
          new StructField("leaf", t, false, Metadata.empty()));
    }

    void addSlot(int r, int d) {
      if (slots >= rep.length) {
        rep = java.util.Arrays.copyOf(rep, rep.length * 2);
        def = java.util.Arrays.copyOf(def, def.length * 2);
      }
      rep[slots] = r;
      def[slots] = d;
      slots++;
    }

    void rowEnd() {
      if (rows >= slotEnd.length) {
        slotEnd = java.util.Arrays.copyOf(slotEnd, slotEnd.length * 2);
        presEnd = java.util.Arrays.copyOf(presEnd, presEnd.length * 2);
      }
      slotEnd[rows] = slots;
      presEnd[rows] = values.n;
      rows++;
    }

    void reset() {
      slots = 0;
      rows = 0;
      values.reset();
    }
  }

  /** One nested top-level column being accumulated. */
  static final class NestedColBuf {
    final StructField field;
    final Node root;
    final LeafW[] leaves;
    int n = 0;
    int topNulls = 0;
    int[] nullEnd = new int[1 << 10]; // cumulative top-level nulls per row

    NestedColBuf(StructField f) {
      this.field = f;
      List<LeafW> lw = new ArrayList<>();
      this.root = buildNode(f.dataType(), f.nullable(), 0, 0, lw);
      this.leaves = lw.toArray(new LeafW[0]);
    }

    /** Mirror of nested.py leaf_specs' walk: each optional node adds one
     * def level, each repeated node one rep depth and one def level. */
    private static Node buildNode(DataType t, boolean nullable, int rep, int def,
        List<LeafW> leaves) {
      int d = def + (nullable ? 1 : 0);
      int lo = leaves.size();
      if (t instanceof StructType) {
        StructField[] fs = ((StructType) t).fields();
        Node[] ch = new Node[fs.length];
        for (int i = 0; i < fs.length; i++) {
          ch[i] = buildNode(fs[i].dataType(), fs[i].nullable(), rep, d, leaves);
        }
        return new Node(t, nullable, ch, lo, leaves.size(), -1);
      }
      if (t instanceof ArrayType) {
        ArrayType a = (ArrayType) t;
        Node elem = buildNode(a.elementType(), a.containsNull(), rep + 1, d + 1, leaves);
        return new Node(t, nullable, new Node[] {elem}, lo, leaves.size(), -1);
      }
      if (t instanceof MapType) {
        MapType m = (MapType) t;
        Node k = buildNode(m.keyType(), false, rep + 1, d + 1, leaves);
        Node v = buildNode(m.valueType(), m.valueContainsNull(), rep + 1, d + 1, leaves);
        return new Node(t, nullable, new Node[] {k, v}, lo, leaves.size(), -1);
      }
      LeafW lf = new LeafW(t, rep, d);
      leaves.add(lf);
      return new Node(t, nullable, new Node[0], lo, leaves.size(), lo);
    }

    /** Shred one row's value for this column (null allowed). */
    void add(Object v) {
      shred(v, root, 0, 0, 0);
      for (LeafW lf : leaves) lf.rowEnd();
      if (v == null) topNulls++;
      if (n >= nullEnd.length) {
        nullEnd = java.util.Arrays.copyOf(nullEnd, nullEnd.length * 2);
      }
      nullEnd[n] = topNulls;
      n++;
    }

    /** Top-level null count in rows [r0, r1) — feeds the sidecar's
    * nulls-only zone entry (min/max stay null: nested columns carry no
    * value stats, Python-writer parity, but IS NULL / IS NOT NULL
    * pruning still fires). */
    int nullsInRange(int r0, int r1) {
      int a = r0 == 0 ? 0 : nullEnd[r0 - 1];
      int b = r1 == 0 ? 0 : nullEnd[r1 - 1];
      return b - a;
    }

    private void emitSlots(Node node, int rep, int def) {
      for (int l = node.leafLo; l < node.leafHi; l++) leaves[l].addSlot(rep, def);
    }

    /** repSlot: the rep value this logical position carries (inherited
     * from where its outermost new record/element boundary sits);
     * nodeRep: the node's repetition depth. */
    private void shred(Object v, Node node, int repSlot, int def, int nodeRep) {
      if (node.nullable) {
        if (v == null) {
          emitSlots(node, repSlot, def);
          return;
        }
        def++;
      } else if (v == null) {
        // a null in a non-nullable position (possible under permissive
        // upstreams: a UDF or from_json violating a containsNull=false
        // contract). Emitting a slot here would be WORSE than failing:
        // for a leaf the current def equals the leaf's maxDef, so the
        // reader would count the slot as PRESENT with no value encoded —
        // present-value ranks desync and the persisted file decodes
        // garbage. Refuse loudly; the caller can fix the contract or
        // route the write through the Python sink (which nulls are
        // rejected by pyarrow's schema validation the same way).
        throw new IllegalStateException(
            "quiverjvm write: NULL in non-nullable nested position of type "
                + node.type + " — declare the field nullable or clean the "
                + "input; refusing to persist an undecodable file");
      }
      DataType t = node.type;
      if (t instanceof StructType) {
        InternalRow r = (InternalRow) v;
        StructField[] fs = ((StructType) t).fields();
        for (int i = 0; i < fs.length; i++) {
          Object cv = r.isNullAt(i) ? null : get(r, i, fs[i].dataType());
          shred(cv, node.children[i], repSlot, def, nodeRep);
        }
        return;
      }
      if (t instanceof ArrayType) {
        ArrayData a = (ArrayData) v;
        int m = a.numElements();
        if (m == 0) {
          emitSlots(node, repSlot, def);
          return;
        }
        DataType et = ((ArrayType) t).elementType();
        for (int i = 0; i < m; i++) {
          Object ev = a.isNullAt(i) ? null : get(a, i, et);
          shred(ev, node.children[0], i == 0 ? repSlot : nodeRep + 1, def + 1,
              nodeRep + 1);
        }
        return;
      }
      if (t instanceof MapType) {
        MapData md = (MapData) v;
        int m = md.numElements();
        if (m == 0) {
          emitSlots(node, repSlot, def);
          return;
        }
        MapType mt = (MapType) t;
        ArrayData ks = md.keyArray();
        ArrayData vs = md.valueArray();
        for (int i = 0; i < m; i++) {
          int childRep = i == 0 ? repSlot : nodeRep + 1;
          shred(get(ks, i, mt.keyType()), node.children[0], childRep, def + 1,
              nodeRep + 1);
          Object vv = vs.isNullAt(i) ? null : get(vs, i, mt.valueType());
          shred(vv, node.children[1], childRep, def + 1, nodeRep + 1);
        }
        return;
      }
      // primitive leaf: present value (def now == maxDef by construction)
      LeafW lf = leaves[node.leafIdx];
      lf.addSlot(repSlot, def);
      addLeafValue(lf.values, t, v);
    }

    void reset() {
      for (LeafW lf : leaves) lf.reset();
      n = 0;
      topNulls = 0;
    }
  }

  /** Test hook (round 13): shred one JSON-encoded value through a nested
   * column buffer and return the total leaf slot count. Exists so tests
   * can exercise contract violations (null in a non-nullable position —
   * the ADVICE r12 refusal) that Spark's own Python-side producers coerce
   * away before the sink ever sees them. JSON arrays → ArrayData, JSON
   * objects → InternalRow (schema field order), JSON null → null. */
  public static int shredJsonForTest(String schemaJson, String valueJson)
      throws Exception {
    StructField f =
        ((StructType) DataType.fromJson(schemaJson)).fields()[0];
    NestedColBuf buf = new NestedColBuf(f);
    com.fasterxml.jackson.databind.JsonNode v =
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(valueJson);
    buf.add(jsonToCatalyst(v, f.dataType()));
    int slots = 0;
    for (LeafW lf : buf.leaves) slots += lf.slots;
    return slots;
  }

  static Object jsonToCatalyst(com.fasterxml.jackson.databind.JsonNode v, DataType t) {
    if (v == null || v.isNull()) return null;
    if (t instanceof ArrayType) {
      Object[] out = new Object[v.size()];
      for (int i = 0; i < v.size(); i++) {
        out[i] = jsonToCatalyst(v.get(i), ((ArrayType) t).elementType());
      }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
    }
    if (t instanceof StructType) {
      StructField[] fs = ((StructType) t).fields();
      Object[] out = new Object[fs.length];
      for (int i = 0; i < fs.length; i++) {
        out[i] = jsonToCatalyst(v.get(fs[i].name()), fs[i].dataType());
      }
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out);
    }
    if (t == org.apache.spark.sql.types.DataTypes.LongType) return v.asLong();
    if (t == org.apache.spark.sql.types.DataTypes.IntegerType) return v.asInt();
    if (t == org.apache.spark.sql.types.DataTypes.DoubleType) return v.asDouble();
    if (t == org.apache.spark.sql.types.DataTypes.BooleanType) return v.asBoolean();
    if (t == org.apache.spark.sql.types.DataTypes.StringType) {
      return org.apache.spark.unsafe.types.UTF8String.fromString(v.asText());
    }
    throw new UnsupportedOperationException("test hook: type " + t);
  }

  static Object get(SpecializedGetters g, int i, DataType t) {
    if (t instanceof LongType || t instanceof TimestampType
        || t instanceof TimestampNTZType) {
      return g.getLong(i);
    }
    if (t instanceof IntegerType || t instanceof DateType) return g.getInt(i);
    if (t instanceof DoubleType) return g.getDouble(i);
    if (t instanceof FloatType) return g.getFloat(i);
    if (t instanceof ShortType) return g.getShort(i);
    if (t instanceof ByteType) return g.getByte(i);
    if (t instanceof BooleanType) return g.getBoolean(i);
    if (t instanceof StringType) return g.getUTF8String(i);
    if (t instanceof BinaryType) return g.getBinary(i);
    if (t instanceof DecimalType) {
      DecimalType d = (DecimalType) t;
      return g.getDecimal(i, d.precision(), d.scale());
    }
    if (t instanceof ArrayType) return g.getArray(i);
    if (t instanceof MapType) return g.getMap(i);
    if (t instanceof StructType) return g.getStruct(i, ((StructType) t).size());
    throw new UnsupportedOperationException("quiverjvm: unsupported nested leaf " + t);
  }

  static void addLeafValue(QuiverFileEncoder.ColBuf c, DataType t, Object v) {
    if (t instanceof LongType || t instanceof TimestampType
        || t instanceof TimestampNTZType) {
      c.addLong((Long) v);
    } else if (t instanceof IntegerType || t instanceof DateType) {
      c.addInt((Integer) v);
    } else if (t instanceof DoubleType) {
      c.addDouble((Double) v);
    } else if (t instanceof FloatType) {
      c.addFloat((Float) v);
    } else if (t instanceof ShortType) {
      c.addShort((Short) v);
    } else if (t instanceof ByteType) {
      c.addByteVal((Byte) v);
    } else if (t instanceof BooleanType) {
      c.addBool((Boolean) v);
    } else if (t instanceof StringType) {
      c.addBytes(((org.apache.spark.unsafe.types.UTF8String) v).getBytes());
    } else if (t instanceof BinaryType) {
      c.addBytes((byte[]) v);
    } else if (t instanceof DecimalType) {
      c.addDecimal(((org.apache.spark.sql.types.Decimal) v)
          .toJavaBigDecimal().unscaledValue());
    } else {
      throw new UnsupportedOperationException("quiverjvm: unsupported nested leaf " + t);
    }
  }

  static int bitsFor(int maxLevel) {
    return Math.max(1, 32 - Integer.numberOfLeadingZeros(Math.max(maxLevel, 1)));
  }

  /** encode_levels twin: uleb128((groups<<1)|1) + n*width bits LSB-first,
   * padded to whole 8-value groups. */
  static byte[] levelsBytes(int[] lv, int from, int to, int width) {
    int n = to - from;
    int groups = (n + 7) / 8;
    byte[] header = QuiverFileEncoder.uleb128(((long) groups << 1) | 1);
    byte[] bits = new byte[groups * width];
    int bitPos = 0;
    for (int i = 0; i < n; i++) {
      int v = lv[from + i];
      for (int b = 0; b < width; b++) {
        if (((v >> b) & 1) != 0) bits[bitPos >> 3] |= (1 << (bitPos & 7));
        bitPos++;
      }
    }
    byte[] out = new byte[header.length + bits.length];
    System.arraycopy(header, 0, out, 0, header.length);
    System.arraycopy(bits, 0, out, header.length, bits.length);
    return out;
  }

  /** One nested leaf page for rows [r0, r1):
   * `rows u32 | rep_len u32 | def_len u32 | rep | def | values`, values
   * through the same typed cascade flat pages use. Returns the page's
   * slot count (the PageMeta num_values for nested leaves). */
  static int encodeLeafPage(QuiverFileEncoder.LeBuf out, LeafW lf, int r0, int r1,
      int codec, double adaptiveRatio, int forbid) {
    int s0 = r0 == 0 ? 0 : lf.slotEnd[r0 - 1];
    int s1 = r1 == 0 ? 0 : lf.slotEnd[r1 - 1];
    int p0 = r0 == 0 ? 0 : lf.presEnd[r0 - 1];
    int p1 = r1 == 0 ? 0 : lf.presEnd[r1 - 1];
    byte[] repB = levelsBytes(lf.rep, s0, s1, bitsFor(lf.maxRep));
    byte[] defB = levelsBytes(lf.def, s0, s1, bitsFor(lf.maxDef));
    out.putInt(r1 - r0);
    out.putInt(repB.length);
    out.putInt(defB.length);
    out.putBytes(repB, 0, repB.length);
    out.putBytes(defB, 0, defB.length);
    QuiverFileEncoder.ColBuf c = lf.values;
    int len = p1 - p0;
    if (c.isBool) {
      QuiverFileEncoder.encodeBoolPage(out, c, p0, len, codec, adaptiveRatio, forbid);
    } else if (c.isVarlen) {
      QuiverFileEncoder.encodeBinaryPage(out, c, p0, len, codec, adaptiveRatio, forbid);
    } else {
      QuiverFileEncoder.encodeFixedPage(out, c, p0, len, codec, adaptiveRatio, forbid);
    }
    return s1 - s0;
  }
}
