"""One-decade(-plus) scaling sweep — the per-round guard that caught the
round-9 df-cap recall collapse.

Builds an sfN-equivalent fixture by replicating the sf0.1 tables K times
with ids remapped into disjoint ranges (text/vectors/timestamps
UNCHANGED — the pathological viral-duplicate regime for dedup, and a
same-density user/event scale-up for the windowed families), then runs a
query list against it, recording rows + wall, and optionally hash-checks
against DuckDB on the same fixture parquet.

Usage:
    python examples/decade_sweep.py --factor 10 \
        --queries dedup_ngram_jaccard,ann_sq8_topk --oracle
    python examples/decade_sweep.py --factor 100 --queries dedup_span_excision

The fixture lands under /tmp/quiver_sweep/x{K}/ (symlinking the tables a
query does not scale), cached across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.1"
#: id column to remap per scaled table (disjoint ranges per copy)
SCALED = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}
#: additionally offset per copy so entity cardinality scales with data
#: (same per-entity density — the realistic 10x for windowed queries)
SECONDARY = {"events": "user_id"}

#: COUPLED TPC-H scaling (round 14 — so the FK-shaped operators get real
#: decade rows: sketch_bloom_membership's orders build side,
#: dq_referential_audit's three edges). Every key column offsets by the
#: step of the table that OWNS the key space, so each copy is an intact
#: referential universe: orphan/childless counts and bloom membership
#: scale exactly xK. {table: {column: key_space}}; step of a key space =
#: max of its owner column + 1.
TPCH_KEYS = {
    "customer": ("customer", "c_custkey"),
    "orders": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
}
TPCH_SCALED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
}


def build_fixture(spark, factor: int, tpch: bool = False) -> str:
    import pyarrow.parquet as pq

    out = f"/tmp/quiver_sweep/x{factor}{'t' if tpch else ''}"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    # {table: {column: per-copy offset step}}
    plans: dict[str, dict[str, int]] = {}
    for t, idcol in SCALED.items():
        base = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        step = (base.agg(F.max(idcol)).collect()[0][0] or 0) + 1
        plans[t] = {idcol: step}
        sec = SECONDARY.get(t)
        if sec:
            plans[t][sec] = (base.agg(F.max(sec)).collect()[0][0] or 0) + 1
    if tpch:
        steps = {}
        for space, (owner, col) in TPCH_KEYS.items():
            owner_df = spark.read.parquet(f"{SRC_SF}/{owner}.parquet")
            steps[space] = (owner_df.agg(F.max(col)).collect()[0][0] or 0) + 1
        for t, cols in TPCH_SCALED.items():
            plans[t] = {c: steps[space] for c, space in cols.items()}

    for t, colsteps in plans.items():
        src = f"{SRC_SF}/{t}.parquet"
        base = spark.read.parquet(src)
        copies = []
        for k in range(factor):
            c = base
            for col, step in colsteps.items():
                c = c.withColumn(col, F.col(col) + F.lit(k * step))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        # ONE parquet file per table keeps the DuckDB oracle layout simple
        df.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(
            os.path.join(out, f"_{t}")
        )
        # repack to <table>.parquet (single file) for tables.load
        import pyarrow.dataset as ds

        data = ds.dataset(os.path.join(out, f"_{t}"), format="parquet")
        pq.write_table(data.to_table(), os.path.join(out, f"{t}.parquet"))
        import shutil

        shutil.rmtree(os.path.join(out, f"_{t}"))
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SRC_SF}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", required=True, help="comma-separated names")
    ap.add_argument("--oracle", action="store_true", help="DuckDB hash check")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--tpch",
        action="store_true",
        help="also scale customer/orders/lineitem/part/supplier with "
        "coupled FK offsets (separate x{K}t fixture)",
    )
    args = ap.parse_args()

    from quiver_spark.registry import load_all_operators
    from quiver_spark.session import get_spark
    from quiver_spark.tables import TABLES

    spark = get_spark("decade-sweep")
    specs = load_all_operators()
    fixture = build_fixture(spark, args.factor, tpch=args.tpch)
    print(f"fixture: {fixture}", file=sys.stderr)

    con = None
    if args.oracle:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{fixture}/{t}.parquet')"
            )

    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        spec = specs[name]
        walls = []
        rows = None
        for _ in range(max(args.reps, 1)):
            t0 = time.time()
            df = spec.spark(spark, fixture)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        rows = spec.spark(spark, fixture).count()
        rec = {"rows": rows, "wall_min": min(walls), "walls": walls}
        if con is not None and spec.oracle:
            spdf = spec.spark(spark, fixture).toPandas()
            odf = con.execute(spec.oracle).fetchdf()

            def norm(pdf):
                pdf = pdf.reindex(sorted(pdf.columns), axis=1)
                return sorted(
                    tuple(repr(x) for x in r)
                    for r in pdf.itertuples(index=False)
                )

            rec["oracle_match"] = norm(spdf) == norm(odf)
        results[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    print(json.dumps({"factor": args.factor, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
