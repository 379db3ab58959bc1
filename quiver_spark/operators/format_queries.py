"""Format-backed queries: run relational workloads over quiver-stored
tables and oracle-check them against the parquet originals — this routes the
driver's correctness gate through the full native-format write+scan path.

The parquet→quiver conversion is cached per (sf_dir, table) under /tmp so
repeated gate runs pay the conversion once.
"""

from __future__ import annotations

import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.functions import dec, dsum, revenue, sql_dsum, SQL_REVENUE
from quiver_spark.registry import register
from quiver_spark.sources import register as register_format
from quiver_spark.tables import maybe_broadcast


def quiver_dir_size_bytes(table_dir: str) -> int | None:
    """On-disk byte footprint of a quiver table's live snapshot, or None.

    A Python DataSource cannot report Catalyst statistics (plan-time stats
    read Long.MaxValue), so size-gated broadcast hints over quiver scans
    read the table's own metadata instead. Served from the commit-time
    MANIFEST when present (per-file ``size`` entries — ONE directory-level
    read, the object-store posture: no per-file HEAD storm at 100k files;
    sizes ride ``current_commit``, and a stale entry only skews an
    order-of-magnitude gate decision, never correctness); manifest-less
    directories fall back to driver-side stat calls over the same listing
    the planner performs. Compressed bytes understate in-memory size ~2x
    (BASELINE.md compression ratio), comfortably inside the gate's
    headroom."""
    try:
        from quiver_spark.sources.manifest import load_manifest
        from quiver_spark.sources.quiver_datasource import (
            _data_root,
            _list_files,
        )

        man = load_manifest(_data_root(table_dir))
        if man is not None and man.entries:
            # raw entries, NOT stat-validated lookup(): per-file stat
            # validation would reintroduce the very per-file round trips
            # the manifest exists to avoid, and a stale size only skews
            # an order-of-magnitude gate decision
            return sum(int(e.size) for e in man.entries.values())
        return sum(os.stat(f).st_size for f in _list_files(table_dir))
    except Exception:
        return None

# v2: nested page layout corrected to reference semantics (meta num_values
# = slot count, prefix u32 = rows) — old cached conversions are unreadable.
# v3: sidecars gain page_crc32 — old caches would silently skip the default
# read-side verification, so bench/gate timings would not measure it.
# v4 (round 15): sidecars grew per-page integer sums (the pushed-SUM
# aggregate's source) — the version bump forces fixture rebuild on every
# machine so gates exercise sum-bearing stats, not pre-sum leftovers
CACHE_ROOT = "/tmp/quiver_cache/v4"


def quiver_dir(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    codec: str = "lz4",
    sort_by: str | None = None,
    adaptive: bool = True,
) -> str:
    """Convert a testdata parquet table → a cached quiver directory (once
    per sf/table/codec) and return the directory path. ``adaptive=False``
    disables the chooser (basic block codec only) — the comparison point
    for the compression-ratio proxy."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    suffix = f"-s_{sort_by}" if sort_by else ""
    if not adaptive:
        suffix += "-basic"
    d = os.path.join(CACHE_ROOT, tag, f"{name}-{codec}{suffix}")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        from quiver_spark.format.writer import WriteOptions, write_table

        os.makedirs(d, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/{name}.parquet")
        if sort_by:
            t = t.sort_by(sort_by)
        write_table(
            t,
            os.path.join(d, "part-0.quiver"),
            WriteOptions(
                default_codec=codec,
                compress_ratio=2.0 if adaptive else None,
            ),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return d


# Loaded-relation cache: one logical relation per (app, quiver dir,
# options), the catalog pattern — a production deployment registers each
# table once in a metastore and every query references the same relation.
# Re-calling spark.read.format("quiver").load() per query pays a ~0.25 s
# Python-worker round trip (datasource instantiation + schema()) that a
# registered table never pays; on a 600k-row full scan that tax alone is
# >1× the parquet control. ONLY stateless relations are cached: with
# pruning off, planned partitions depend exclusively on static options and
# Spark re-applies every filter row-level above the scan, so sharing one
# relation across arbitrarily-filtered queries is safe. page_prune /
# partition_prune relations carry per-query pushed-filter state and must
# stay fresh per call.
_DF_CACHE: dict[tuple, DataFrame] = {}


#: quiver_relation options that are pure Python-DS performance hints —
#: the JVM engine needs neither (Catalyst prunes columns, planning is
#: JVM-side), so a call using ONLY these may route to the fast engine.
_PERF_HINT_OPTS = frozenset({"planning_parallelism", "columns", "limit"})


def quiver_relation(
    spark: SparkSession, d: str, engine: str = "auto", **options: str
) -> DataFrame:
    """Cached pruning-off quiver relation for a directory + static options.

    ``engine="auto"`` (round 12, VERDICT r11 item 5) routes through the
    unified entry's REAL-guard probe: calls whose options are pure
    Python-DS performance hints ride the quiverjvm columnar reader when
    the table is eligible (``columns`` becomes a plain ``.select`` —
    Catalyst pushes the pruning down), everything else — and
    ``engine="python"``, which the bench's engine-labelled proxies use —
    keeps the Python DataSource.

    Split planning's dynamic floor divides by ``planning_parallelism``;
    the planner runs in a separate Python process that only sees the
    planner HOST's cpu count, so pass the session's true
    ``defaultParallelism`` (on a cluster: total executor cores) — the
    value that actually bounds concurrent tasks."""
    options.setdefault(
        "planning_parallelism", str(spark.sparkContext.defaultParallelism)
    )
    assert "page_prune" not in options and "partition_prune" not in options
    key = (
        spark.sparkContext.applicationId,
        d,
        engine,
        tuple(sorted(options.items())),
    )
    df = _DF_CACHE.get(key)
    if df is None:
        from quiver_spark.sources import JVM_SEMANTIC_OPTS

        if engine == "auto" and set(options) <= (
            _PERF_HINT_OPTS | JVM_SEMANTIC_OPTS
        ):
            from quiver_spark.sources import try_jvm_scan

            # semantic options (version / changes_since / files /
            # merge_schemas) ride the JVM engine since round 13 — they are
            # driver-side-resolvable, so time travel & CDC scans no longer
            # pay the Python DS's many-small-files floor; perf hints
            # translate (columns → .select, Catalyst pushes the pruning)
            sem = {
                k: v for k, v in options.items() if k in JVM_SEMANTIC_OPTS
            }
            df = try_jvm_scan(spark, d, **sem)
            if df is not None:
                # columns → .select (Catalyst prunes), limit → .limit
                # (DSv2 pushLimit) — round 14, VERDICT r13 Next #2
                from quiver_spark.sources import _apply_translated

                df = _apply_translated(df, options)
        if df is None:
            r = spark.read.format("quiver")
            for k, v in options.items():
                r = r.option(k, v)
            df = r.load(d)
            if "limit" in options:
                # mirror sources.scan (ADVICE r14): the DS option
                # short-circuits planning/decode at page granularity; the
                # outer .limit makes THIS entry's contract exact-N on both
                # engines (raw .option("limit") on the Python DS keeps the
                # documented page-granular semantics)
                df = df.limit(int(options["limit"]))
        _DF_CACHE[key] = df
    return df


def quiver_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    codec: str = "lz4",
    sort_by: str | None = None,
    columns: list[str] | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Load a testdata table through the quiver format (converting parquet →
    quiver once per sf/table/codec).

    ``sort_by`` clusters rows on a column before writing so the per-page
    min/max sidecar (format/stats.py) gives disjoint page ranges — the
    scale-out pattern for zone-map pruning: sort on the hot predicate column
    at ingest, and selective scans touch only matching pages.

    ``columns`` is the projection: pass the statically-known column list and
    executors open + decode ONLY those leaves (the reference's per-column
    independence — ColumnMeta.offset, /root/reference/src/lib.rs:40-43;
    callers open only selected fields, examples/strawboat_read.rs:60-78).
    It must be EXPLICIT because Spark 4.1.2's PythonScanBuilder implements
    only SupportsPushDownFilters — verified by javap of
    spark-sql_2.13-4.1.2.jar — so Catalyst's column pruning can never reach
    a Python datasource; without this option a 1-of-16-column query decodes
    the full row width (measured 4.0x vs parquet at sf0.1; with the option
    the narrow scan is at parity). Include every column the query filters
    on, not just the ones it returns."""
    d = quiver_dir(spark, sf_dir, name, codec, sort_by)
    opts: dict[str, str] = {}
    if columns is not None:
        opts["columns"] = ",".join(columns)
    if sort_by is not None:
        # pruning path. The JVM engine prunes pages from the
        # manifest-inlined zone maps on every pushed filter (per-query
        # ScanBuilder state — no plan-cache hazard), so eligible tables
        # ride it directly (round 12).
        if engine == "auto":
            from quiver_spark.sources import try_jvm_scan

            df = try_jvm_scan(spark, d)
            if df is not None:
                return df.select(*columns) if columns is not None else df
        # Python-DS page_prune readers carry per-query pushed-filter
        # state, so they must be a fresh relation per call — Spark's plan
        # cache could otherwise replay this load's pruned partitions for a
        # differently-filtered query (the datasource's documented sharp
        # edge). Zone maps only pay off on sorted/clustered columns anyway.
        opts.setdefault(
            "planning_parallelism",
            str(spark.sparkContext.defaultParallelism),
        )
        r = spark.read.format("quiver").option("page_prune", "true")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(d)
    return quiver_relation(spark, d, engine=engine, **opts)


@register(
    "quiver_scan_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("format", "scan", "agg"),
)
def quiver_scan_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-style aggregate over the NATIVE quiver format scan; the oracle
    reads the parquet original — proving byte-faithful decode end-to-end."""
    li = quiver_table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.round(F.sum(revenue()).cast("double"), 2).alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "quiver_scan_checksums",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS price_sum,
       MIN(o_orderstatus) AS min_status,
       MAX(o_orderpriority) AS max_priority,
       COUNT(DISTINCT o_custkey) AS custs
FROM orders
""",
    tags=("format", "scan"),
)
def quiver_scan_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column checksums over quiver-stored orders (every type family:
    int keys, doubles, strings, timestamps feed the group below)."""
    o = quiver_table(
        spark,
        sf_dir,
        "orders",
        columns=[
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            "o_orderpriority",
            "o_custkey",
        ],
    )
    return o.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        dsum("o_totalprice").alias("price_sum"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderpriority").alias("max_priority"),
        F.countDistinct("o_custkey").alias("custs"),
    )


@register(
    "quiver_adaptive_zstd_join",
    oracle=f"""
SELECT n_name,
       ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS cnt
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("format", "scan", "join"),
)
def quiver_adaptive_zstd_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join across FOUR quiver-stored tables written with the adaptive zstd
    cascade — dict/rle/freq pages all land in real query results."""
    li = quiver_table(
        spark,
        sf_dir,
        "lineitem",
        codec="zstd",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o = quiver_table(
        spark, sf_dir, "orders", codec="zstd", columns=["o_orderkey", "o_custkey"]
    )
    c = quiver_table(
        spark, sf_dir, "customer", codec="zstd", columns=["c_custkey", "c_nationkey"]
    )
    # customer scales linearly with the data — gate the hint on the quiver
    # table's estimated DECODED size (ANALYZE stats when present, else
    # disk x decode ratio: compressed bytes understate the broadcast's
    # in-memory footprint ~2-4x — Catalyst stats are opaque for Python DS
    # scans); nation is a 25-row constant, unconditional broadcast is
    # always right.
    from quiver_spark.tables import quiver_gate_size_bytes

    c_size = quiver_gate_size_bytes(quiver_dir(spark, sf_dir, "customer", "zstd"))
    n = quiver_table(
        spark, sf_dir, "nation", codec="zstd", columns=["n_nationkey", "n_name"]
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, size_bytes=c_size), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "quiver_pruned_date_scan",
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_returnflag
""",
    tags=("format", "scan", "pushdown"),
)
def quiver_pruned_date_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective date-range scan over lineitem CLUSTERED on l_shipdate:
    the pushed filter prunes non-matching pages via the min/max sidecar
    before any partition is scheduled (zone-map pattern; the reference
    format itself stores no stats — src/lib.rs:75-80 — this is the
    engine-side extension of SURVEY §4)."""
    li = quiver_table(
        spark,
        sf_dir,
        "lineitem",
        sort_by="l_shipdate",
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
    )
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "quiver_scan_embeddings",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
       CAST(SUM(
           (SELECT SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                       * CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
            FROM unnest(embedding) AS t(x))
       ) AS BIGINT) AS inorm_sum
FROM embeddings
GROUP BY label
""",
    tags=("format", "scan", "nested"),
)
def quiver_scan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED column (embedding list<float>) through the quiver format's
    Dremel rep/def path (format/nested.py): per-label counts and exact
    integer-quantized norm sums over the quiver scan, oracled against the
    parquet original."""
    from quiver_spark.functions import int_vec

    e = quiver_table(spark, sf_dir, "embeddings", columns=["label", "embedding"])
    iv = e.select("label", F.size("embedding").alias("dims"), int_vec("embedding").alias("iv"))
    return iv.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("dims").cast("bigint").alias("total_dims"),
        F.sum(
            F.aggregate(
                "iv", F.lit(0).cast("bigint"), lambda a, x: a + x * x
            )
        ).cast("bigint").alias("inorm_sum"),
    )


@register(
    "quiver_limit_head",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key
FROM (SELECT o_orderkey FROM orders LIMIT 1000) t
""",
    tags=("format", "scan", "limit"),
)
def quiver_limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT-shaped scan through the source-level short-circuit: the
    `limit` option caps partition planning AND page decode (the reference
    nth/skip_page analogue, src/read/reader.rs:91-146), then Spark's own
    .limit trims to exactly N. Deterministic because the quiver conversion
    preserves parquet row order and both engines take the file-order
    prefix."""
    d = quiver_dir(spark, sf_dir, "orders")
    # limit/columns are static options → the relation is stateless and
    # cacheable like any catalog table
    head = quiver_relation(
        spark, d, limit="1000", columns="o_orderkey"
    ).limit(1000)
    return head.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.min("o_orderkey").cast("bigint").alias("first_key"),
    )


def partitioned_documents_dir(spark: SparkSession, sf_dir: str) -> str:
    """Documents written once per sf as a Hive-partitioned quiver layout
    (`lang=<v>/part-*.quiver`); returns the directory."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, "documents-bylang")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .write.format("quiver")
            .option("partition_by", "lang")
            .mode("overwrite")
            .save(d)
        )
        with open(marker, "w") as f:
            f.write("ok")
    return d


@register(
    "quiver_partitioned_scan",
    oracle="""
SELECT lang, COUNT(*) AS docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
FROM documents
WHERE lang >= 'e'
GROUP BY lang
""",
    tags=("format", "scan", "partition"),
)
def quiver_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned quiver layout: documents written once per sf under
    `lang=<v>/` subdirs, then scanned with `partition_prune=true` so the
    pushed `lang >= 'e'` filter skips non-matching FILES before any byte is
    read — the engine's directory-pruning scale story (a partition-key
    filter costs O(matching files) at 100 TB, not O(dataset))."""
    d = partitioned_documents_dir(spark, sf_dir)
    docs = (
        spark.read.format("quiver")
        .option("partition_prune", "true")
        .option("columns", "lang,text")
        .load(d)
        .filter(F.col("lang") >= "e")
    )

    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_len"),
    )


@register(
    "quiver_scan_documents",
    oracle="""
SELECT lang, COUNT(*) AS docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len,
       SUBSTR(MIN(md5(text)), 1, 8) AS min_fp
FROM documents
GROUP BY lang
""",
    tags=("format", "scan", "text"),
)
def quiver_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-heavy table through the binary page codecs."""
    d = quiver_table(spark, sf_dir, "documents", columns=["lang", "text"])
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_len"),
        F.substring(F.min(F.md5(F.col("text").cast("binary"))), 1, 8).alias(
            "min_fp"
        ),
    )


def _derived_quiver_dir(spark: SparkSession, sf_dir: str, name: str, build) -> str:
    """Marker-gated cache scaffold shared by the derived-table format
    queries below: ``build(sf_dir) -> pa.Table``, written once per
    (sf, name) with the default adaptive-lz4 options."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, name)
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        from quiver_spark.format.writer import WriteOptions, write_table

        os.makedirs(d, exist_ok=True)
        write_table(
            build(sf_dir),
            os.path.join(d, "part-0.quiver"),
            WriteOptions(default_codec="lz4", compress_ratio=2.0),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _pa_mod(col, k: int):
    """x % k for non-negative ints (pyarrow ships no mod kernel)."""
    import pyarrow.compute as pc

    return pc.subtract(col, pc.multiply(pc.divide(col, k), k))


def _build_bools(sf_dir: str):
    """orders projected to derived BOOLEAN columns (one dense, one with
    nulls) — drives the boolean page cascade (one_value / rle / bitpacked
    validity, reference src/compression/boolean/*) through a real scan.
    Sorted on the thresholded column so is_big becomes two runs and the
    RLE/one-value cascade wins pages (aggregates ignore row order)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet").sort_by("o_totalprice")
    big = pc.greater(t["o_totalprice"], 150000.0)
    urgent = pc.equal(t["o_orderpriority"], "1-URGENT")
    null_mask = pc.less(_pa_mod(t["o_orderkey"], 7), 2)
    maybe = pc.if_else(null_mask, pa.scalar(None, pa.bool_()), big)
    return pa.table(
        {
            "o_orderkey": t["o_orderkey"],
            "is_big": big,
            "is_urgent": urgent,
            "maybe_big": maybe,
        }
    )


@register(
    "quiver_scan_bools",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS big_cnt,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
           AS urgent_cnt,
       CAST(COUNT(CASE WHEN o_orderkey % 7 < 2 THEN NULL
                       ELSE (o_totalprice > 150000.0) END) AS BIGINT)
           AS maybe_known,
       CAST(SUM(CASE WHEN (CASE WHEN o_orderkey % 7 < 2 THEN NULL
                                ELSE (o_totalprice > 150000.0) END)
                     THEN 1 ELSE 0 END) AS BIGINT) AS maybe_big_cnt
FROM orders
""",
    tags=("format", "scan", "boolean"),
)
def quiver_scan_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over NATIVE boolean quiver pages (dense + nullable):
    proves the boolean write cascade and validity decode end-to-end — the
    oracle recomputes the same flags from the parquet originals."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-bools", _build_bools)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("is_big"), 1).otherwise(0))
        .cast("bigint")
        .alias("big_cnt"),
        F.sum(F.when(F.col("is_urgent"), 1).otherwise(0))
        .cast("bigint")
        .alias("urgent_cnt"),
        F.count(F.col("maybe_big")).cast("bigint").alias("maybe_known"),
        F.sum(F.when(F.col("maybe_big"), 1).otherwise(0))
        .cast("bigint")
        .alias("maybe_big_cnt"),
    )


def _build_delta(sf_dir: str):
    """orders keys as SORTED int32 (delta-bitpacking territory: 4-byte,
    non-null, ascending — reference src/compression/integer/delta_bp.rs:
    97-109) plus a small-range int32 (plain bitpacking: min >= 0, <2^12
    so the sampled ratio clears 2.0)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet").sort_by("o_orderkey")
    ok32 = pc.cast(t["o_orderkey"], pa.int32())
    small = pc.cast(_pa_mod(t["o_custkey"], 1000), pa.int32())
    return pa.table({"ok32": ok32, "ck_small": small})


@register(
    "quiver_scan_delta",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(CAST(o_orderkey AS INTEGER)) AS BIGINT) AS key_sum,
       CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
       CAST(MAX(o_orderkey) AS BIGINT) AS key_max,
       CAST(SUM(CAST(o_custkey AS INTEGER) % 1000) AS BIGINT) AS small_sum,
       CAST(MAX(CAST(o_custkey AS INTEGER) % 1000) AS BIGINT) AS small_max
FROM orders
""",
    tags=("format", "scan", "bitpacking"),
)
def quiver_scan_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over delta-bitpacked (sorted int32 keys) and bitpacked
    (small-range int32) quiver pages — the two 4-byte-integer codecs the
    chooser only picks under these exact shapes, oracle-checked against
    the parquet originals."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-delta", _build_delta)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("ok32").cast("bigint").alias("key_sum"),
        F.min("ok32").cast("bigint").alias("key_min"),
        F.max("ok32").cast("bigint").alias("key_max"),
        F.sum("ck_small").cast("bigint").alias("small_sum"),
        F.max("ck_small").cast("bigint").alias("small_max"),
    )


def _build_freq(sf_dir: str):
    """A 90%-one-value int column (top value + roaring exception bitmap,
    reference src/compression/integer/freq.rs:30-152):
    CASE WHEN o_orderkey % 10 == 0 THEN o_orderkey ELSE 0 — top value 0
    holds ~90% of rows and the column max is >=256, satisfying Freq
    eligibility (the synthetic data contains orderkey 0, which the
    oracle's exception-count definition excludes explicitly)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    keys = t["o_orderkey"]
    freq_col = pc.if_else(
        pc.equal(_pa_mod(keys, 10), 0), keys, pa.scalar(0, pa.int64())
    )
    return pa.table({"freqy": freq_col})


@register(
    "quiver_scan_freq",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey ELSE 0 END)
            AS BIGINT) AS freq_sum,
       CAST(MAX(CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey ELSE 0 END)
            AS BIGINT) AS freq_max,
       CAST(SUM(CASE WHEN o_orderkey % 10 = 0 AND o_orderkey <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS exception_cnt
FROM orders
""",
    tags=("format", "scan", "freq"),
)
def quiver_scan_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over a Freq-encoded page set (top value + roaring
    exception positions + recursively-compressed exceptions) — drives the
    roaring bitmap decode through the driver gate."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-freq0", _build_freq)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("freqy").cast("bigint").alias("freq_sum"),
        F.max("freqy").cast("bigint").alias("freq_max"),
        F.sum(F.when(F.col("freqy") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("exception_cnt"),
    )


def _build_nested(sf_dir: str):
    """orders re-shaped into struct and map columns — drives struct/map
    shredding (write_nested, rep/def levels) and assembly (reference
    src/read/array/{struct_,map}.rs) end-to-end."""
    import numpy as np
    import pyarrow as pa

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    status = t["o_orderstatus"].combine_chunks()
    price = t["o_totalprice"].combine_chunks()
    keys = t["o_orderkey"].combine_chunks()
    s = pa.StructArray.from_arrays([status, price], names=["flag", "price"])
    # one-entry map per row: {o_orderstatus: o_orderkey}
    offsets = pa.array(np.arange(len(keys) + 1, dtype=np.int32))
    m = pa.MapArray.from_arrays(offsets, status, keys)
    return pa.table({"o_orderkey": keys, "s": s, "m": m})


@register(
    "quiver_scan_nested_types",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS price_sum,
       MIN(o_orderstatus) AS min_flag,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS BIGINT)
           AS f_key_sum
FROM orders
""",
    tags=("format", "scan", "nested"),
)
def quiver_scan_nested_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over quiver STRUCT and MAP columns (struct field access +
    map element lookup after full rep/def reassembly) — the oracle
    recomputes from the flat parquet originals."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-nested", _build_nested)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("s.price").alias("price_sum"),
        F.min("s.flag").alias("min_flag"),
        F.sum(F.element_at(F.col("m"), "F")).cast("bigint").alias("f_key_sum"),
    )


def _build_uints(sf_dir: str):
    """orders keys derived into all four UNSIGNED widths — drives the
    write-side plain integer cascade over uint leaves (reference
    src/write/primitive.rs:55-70) and the Spark-boundary WIDENING
    (uint8→int16, uint16→int32, uint32→int64, uint64→decimal(20,0);
    SURVEY §1.3) through a real scan. Values include the top half of each
    unsigned range so a same-width signed mapping would corrupt them."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    keys = t["o_orderkey"]
    u8 = pc.cast(pc.add(_pa_mod(keys, 100), 155), pa.uint8())  # 155..254
    u16 = pc.cast(pc.add(_pa_mod(keys, 30000), 35000), pa.uint16())
    u32 = pc.cast(
        pc.add(_pa_mod(keys, 1_000_000), 3_000_000_000), pa.uint32()
    )
    u64 = pc.add(
        pc.cast(keys, pa.uint64()), pa.scalar(2**63, pa.uint64())
    )  # beyond int64
    return pa.table({"u8": u8, "u16": u16, "u32": u32, "u64": u64})


@register(
    "quiver_scan_uints",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(o_orderkey % 100 + 155) AS BIGINT) AS u8_sum,
       CAST(SUM(o_orderkey % 30000 + 35000) AS BIGINT) AS u16_sum,
       CAST(SUM(o_orderkey % 1000000 + 3000000000) AS BIGINT) AS u32_sum,
       CAST(MAX(o_orderkey % 100 + 155) AS BIGINT) AS u8_max,
       CAST(SUM(CAST(o_orderkey AS HUGEINT)
                + CAST('9223372036854775808' AS HUGEINT))
            AS DOUBLE) AS u64_sum
FROM orders
""",
    tags=("format", "scan", "uint"),
)
def quiver_scan_uints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over unsigned-int quiver columns whose values occupy the
    top half of each unsigned range — provably correct only if the Spark
    boundary widens every width (a same-width signed read would wrap
    negative). u64 lands as decimal(20,0) and is summed exactly before one
    final cast to double on both engines."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-uints", _build_uints)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("u8").cast("bigint").alias("u8_sum"),
        F.sum("u16").cast("bigint").alias("u16_sum"),
        F.sum("u32").cast("bigint").alias("u32_sum"),
        F.max("u8").cast("bigint").alias("u8_max"),
        F.sum(F.col("u64").cast("decimal(38,0)")).cast("double").alias("u64_sum"),
    )


def _build_decimals(sf_dir: str):
    """orders totalprice re-typed as decimal128 at two scales — drives the
    fixed-width Int128 page cascade (OneValue/Freq/Dict/RLE over 16-byte
    rows, reference src/compression/integer/traits.rs:30-34) through a
    real scan rather than only the unit matrix."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    price = t["o_totalprice"]
    d12 = pc.cast(
        pc.round(price, ndigits=2), pa.decimal128(12, 2)
    )
    # low-cardinality decimal: CASE over orderstatus → dict/one-value pages
    status = t["o_orderstatus"]
    flat = pc.if_else(
        pc.equal(status, "F"),
        pa.scalar("11.50"),
        pa.scalar("7.25"),
    )
    d38 = pc.cast(flat, pa.decimal128(38, 10))
    return pa.table(
        {"o_orderkey": t["o_orderkey"], "price_dec": d12, "flat_dec": d38}
    )


@register(
    "quiver_scan_decimals",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(12,2))) AS DOUBLE)
           AS price_sum,
       CAST(MIN(CAST(ROUND(o_totalprice, 2) AS DECIMAL(12,2))) AS DOUBLE)
           AS price_min,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST('11.50' AS DECIMAL(38,10))
                     ELSE CAST('7.25' AS DECIMAL(38,10)) END) AS DOUBLE)
           AS flat_sum
FROM orders
""",
    tags=("format", "scan", "decimal"),
)
def quiver_scan_decimals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over decimal128 quiver pages at scale 2 and scale 10
    (the 16-byte fixed-width cascade; the low-cardinality column lands on
    dict/one-value pages) — exact decimal sums, one final cast to double
    on both engines."""
    d = _derived_quiver_dir(spark, sf_dir, "orders-decimals", _build_decimals)
    q = quiver_relation(spark, d)
    return q.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("price_dec").cast("double").alias("price_sum"),
        F.min("price_dec").cast("double").alias("price_min"),
        F.sum("flat_dec").cast("double").alias("flat_sum"),
    )


@register(
    "quiver_sql_view_agg",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("format", "sql-api"),
)
def quiver_sql_view_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string API surface over the native format: a quiver scan is
    registered as a temp view and the query is posed with spark.sql(...) —
    the exact workflow of a SQL-only user (catalog registration instead of
    DataFrame chaining). The plan is identical to the DataFrame form, so
    Catalyst treatment (pruning, pushdown, AQE) is unchanged."""
    # the view name carries a per-call unique suffix: the query's POINT is
    # the catalog-registration workflow, but a fixed name is session-global
    # and concurrent callers in one SparkSession could race between view
    # replacement and analysis
    view = f"quiver_orders_v_{uuid.uuid4().hex}"
    quiver_table(
        spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"]
    ).createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT o_orderpriority,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
                       AS total_price
            FROM {view}
            GROUP BY o_orderpriority
            """
        )
    finally:
        # the returned DataFrame's resolved plan no longer needs the
        # catalog entry; dropping it keeps repeat calls leak-free
        spark.catalog.dropTempView(view)


@register(
    "quiver_narrow_projection",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice')} AS price_sum,
       COUNT(*) AS cnt
FROM lineitem
""",
    tags=("format", "scan", "projection"),
)
def quiver_narrow_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-of-16-column scan through the explicit `columns` projection — the
    reference's per-column read design (ColumnMeta.offset,
    /root/reference/src/lib.rs:40-43; per-field reads,
    examples/strawboat_read.rs:60-78) surfaced at the query layer. Executors
    open + decode ONLY the l_extendedprice leaf; without the option this
    scan decodes the full 16-column width (measured 4.0x vs parquet at
    sf0.1 by the round-6 judge — the wiring this query pins through the
    driver gate)."""
    li = quiver_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    return li.agg(
        dsum("l_extendedprice").alias("price_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "quiver_batch_read",
    oracle="""
SELECT n_regionkey,
       COUNT(*) AS cnt,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS min_name,
       MAX(n_name) AS max_name
FROM nation
GROUP BY n_regionkey
""",
    tags=("format", "batch-read"),
)
def quiver_batch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 column-at-once batch read (format/reader.py read_table; the
    reference's whole-file read path, src/read/mod.rs): the nation table is
    read in-process as ONE Arrow table through read_table — column-subset
    projection exercised — then handed to Spark as a local relation and
    aggregated. This is the engine's embedding API (a library user reading
    a quiver file without a cluster), deliberately driver-local and used
    only on catalog-scale tables; the distributed path is the datasource."""
    from quiver_spark.format.reader import read_table

    d = quiver_dir(spark, sf_dir, "nation")
    t = read_table(
        os.path.join(d, "part-0.quiver"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    df = spark.createDataFrame(t)  # pyspark 4 accepts pyarrow Tables
    return df.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        F.min("n_name").alias("min_name"),
        F.max("n_name").alias("max_name"),
    )


def _compacted_supplier_dir(spark: SparkSession, sf_dir: str) -> str:
    """supplier written as MANY small quiver files (one per 100 rows — the
    streaming-sink shape), then compacted once via maintenance.compact;
    cached per sf like every derived dir."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    small = os.path.join(CACHE_ROOT, tag, "supplier-small-files")
    compacted = os.path.join(CACHE_ROOT, tag, "supplier-compacted")
    marker = os.path.join(compacted, "_done")
    if not os.path.exists(marker):
        from quiver_spark.format.writer import WriteOptions, write_table
        from quiver_spark.maintenance import compact

        os.makedirs(small, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/supplier.parquet")
        step = max(100, t.num_rows // 64)  # bound file count at big SFs
        for i, start in enumerate(range(0, t.num_rows, step)):
            write_table(
                t.slice(start, step),
                os.path.join(small, f"part-{i:05d}.quiver"),
                WriteOptions(default_codec="lz4", compress_ratio=2.0),
            )
        summary = compact(spark, small, compacted, target_rows_per_file=1 << 20)
        assert summary["rows"] == summary["rows_after"] == t.num_rows
        with open(marker, "w") as f:
            f.write("ok")
    return compacted


@register(
    "quiver_compacted_scan",
    oracle="""
SELECT s_nationkey,
       COUNT(*) AS cnt,
       CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS bal_sum,
       MIN(s_name) AS min_name
FROM supplier
GROUP BY s_nationkey
""",
    tags=("format", "maintenance", "compaction"),
)
def quiver_compacted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction correctness through the driver gate: supplier is written
    as many small files (the streaming-sink shape), rewritten by
    maintenance.compact into row-targeted files, and the COMPACTED
    directory is scanned and aggregated — the oracle reads the parquet
    original, so any row lost or duplicated by the rewrite hash-fails."""
    d = _compacted_supplier_dir(spark, sf_dir)
    s = quiver_relation(
        spark, d, columns="s_nationkey,s_suppkey,s_acctbal,s_name"
    )
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("s_suppkey").cast("bigint").alias("key_sum"),
        dsum("s_acctbal").alias("bal_sum"),
        F.min("s_name").alias("min_name"),
    )


def _inplace_compacted_customer_dir(spark: SparkSession, sf_dir: str) -> str:
    """customer written as many small quiver files, then compacted IN
    PLACE (maintenance.compact with no separate destination — the atomic
    generation swap); cached per sf like every derived dir."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, "customer-inplace")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        from quiver_spark.format.writer import WriteOptions, write_table
        from quiver_spark.maintenance import compact

        os.makedirs(d, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/customer.parquet")
        step = max(50, t.num_rows // 48)
        for i, start in enumerate(range(0, t.num_rows, step)):
            write_table(
                t.slice(start, step),
                os.path.join(d, f"part-{i:05d}.quiver"),
                WriteOptions(default_codec="lz4", compress_ratio=2.0),
            )
        summary = compact(spark, d, target_rows_per_file=1 << 20)
        assert summary["rows"] == summary["rows_after"] == t.num_rows
        with open(marker, "w") as f:
            f.write("ok")
    return d


@register(
    "quiver_inplace_compact_scan",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS cnt,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS bal_sum,
       MIN(c_name) AS min_name
FROM customer
GROUP BY c_mktsegment
""",
    tags=("format", "maintenance", "compaction", "generations"),
)
def quiver_inplace_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-PLACE compaction through the driver gate: customer is written as
    many small files, compacted in place via the atomic generation swap
    (the scan that feeds the rewrite freezes the OLD generation while the
    new one publishes — maintenance.compact(spark, dir) with no separate
    destination), and the post-swap table is aggregated against the
    parquet oracle: any row lost, duplicated, or double-resolved across
    generations hash-fails."""
    d = _inplace_compacted_customer_dir(spark, sf_dir)
    c = quiver_relation(
        spark, d, columns="c_mktsegment,c_custkey,c_acctbal,c_name"
    )
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
        dsum("c_acctbal").alias("bal_sum"),
        F.min("c_name").alias("min_name"),
    )


@register(
    "quiver_scan_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(user_id) AS BIGINT) AS user_sum,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY event_type
""",
    tags=("format", "scan", "time"),
)
def quiver_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last driver table through the NATIVE format: events (timestamp +
    double + string + json-ish props) written to quiver and aggregated per
    type — timestamps surface as formatted strings (registry determinism
    rule) and value sums go through exact decimals. Proves the timestamp
    page path against the parquet original on a real table rather than
    only the unit matrix."""
    ev = quiver_table(
        spark,
        sf_dir,
        "events",
        columns=["event_type", "user_id", "value", "ts"],
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("user_id").cast("bigint").alias("user_sum"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("value_sum"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def _nation_generations_dir(spark: SparkSession, sf_dir: str) -> str:
    """nation written TWICE through the overwrite sink with retention:
    generation 1 holds only the nations of regions 0-1, generation 2 holds
    all 25 — the fixture for the time-travel gate query. Built once per sf
    behind a marker; keep_generations=3 so generation 1 stays retained."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, "nation-generations")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        import shutil

        # crash-idempotence: a half-built fixture (interrupted between the
        # overwrites and the marker) must be REBUILT FROM EMPTY — resuming
        # would advance the generation numbers past the version this
        # query pins, and retention would GC the pinned one
        shutil.rmtree(d, ignore_errors=True)
        full = spark.read.parquet(f"{sf_dir}/nation.parquet")
        for df in (full.filter("n_regionkey < 2"), full):
            (
                df.coalesce(1)
                .write.format("quiver")
                .option("keep_generations", "3")
                .mode("overwrite")
                .save(d)
            )
        with open(marker, "w") as f:
            f.write("ok")
    return d


@register(
    "quiver_time_travel_scan",
    oracle="""
SELECT n_regionkey,
       COUNT(*) AS cnt,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS min_name
FROM nation
WHERE n_regionkey < 2
GROUP BY n_regionkey
""",
    tags=("format", "generations", "time-travel"),
)
def quiver_time_travel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the driver gate: nation is overwritten twice
    (subset, then full) with retention, and the query reads
    ``.option("version", "1")`` — the RETAINED first generation — while
    generation 2 is live. The oracle is the subset predicate on the
    parquet original, so a version read that resolves the wrong
    generation, mixes generations, or loses retained files hash-fails.
    Engine-side surface: generation snapshots + ``version`` option
    (quiver_datasource._data_root); the reference format itself is
    single-file with no table layer (/root/reference/src/lib.rs)."""
    d = _nation_generations_dir(spark, sf_dir)
    n = quiver_relation(spark, d, version="1")
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        F.min("n_name").alias("min_name"),
    )


def _supplier_rollback_dir(spark: SparkSession, sf_dir: str) -> str:
    """supplier overwritten twice (nations < 10, then all) and then ROLLED
    BACK to generation 1 via maintenance.rollback_generation — the live
    snapshot is the subset again. Built once per sf behind a marker."""
    register_format(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, "supplier-rollback")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        import shutil

        from quiver_spark.maintenance import rollback_generation

        # crash-idempotence: rebuild from empty (see _nation_generations_dir)
        shutil.rmtree(d, ignore_errors=True)
        full = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        for df in (full.filter("s_nationkey < 10"), full):
            (
                df.coalesce(1)
                .write.format("quiver")
                .option("keep_generations", "3")
                .mode("overwrite")
                .save(d)
            )
        res = rollback_generation(d, 1)
        assert res["rolled_back_to"] == "gen-000001", res
        with open(marker, "w") as f:
            f.write("ok")
    return d


@register(
    "quiver_rollback_scan",
    oracle="""
SELECT s_nationkey,
       COUNT(*) AS cnt,
       CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS bal_sum,
       MIN(s_name) AS min_name
FROM supplier
WHERE s_nationkey < 10
GROUP BY s_nationkey
""",
    tags=("format", "generations", "rollback", "maintenance"),
)
def quiver_rollback_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback through the driver gate: supplier is overwritten twice
    (subset, then full), the table is rolled back to generation 1
    (maintenance.rollback_generation — CAS pointer swap under the writer
    lock), and the LIVE table is scanned. The oracle is the subset
    predicate on the parquet original: a rollback that fails to re-point,
    resurrects the wrong generation, or mixes files hash-fails."""
    d = _supplier_rollback_dir(spark, sf_dir)
    s = quiver_relation(spark, d)
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("s_suppkey").cast("bigint").alias("key_sum"),
        dsum("s_acctbal").alias("bal_sum"),
        F.min("s_name").alias("min_name"),
    )


def arrow_ipc_dir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """A testdata table converted to Arrow IPC through the arrowipc SINK
    (one Spark job — exercises the staged-commit write path, not just
    pyarrow); cached per sf/table behind a marker."""
    register_format(spark)  # registers arrowipc too
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(CACHE_ROOT, tag, f"{name}-arrowipc")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(d, ignore_errors=True)  # crash-idempotent rebuild
        (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .coalesce(1)
            .write.format("arrowipc")
            .mode("overwrite")
            .save(d)
        )
        with open(marker, "w") as f:
            f.write("ok")
    return d


@register(
    "arrow_ipc_scan",
    oracle="""
SELECT p_brand,
       COUNT(*) AS cnt,
       CAST(SUM(p_partkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE)
           AS price_sum,
       MIN(p_name) AS min_name,
       MAX(p_size) AS max_size
FROM part
GROUP BY p_brand
""",
    tags=("format", "arrow", "scan", "interop"),
)
def arrow_ipc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC (.arrow / Feather V2) as a Spark table: part is written
    through the arrowipc sink (staged commit + generation machinery
    shared with quiver) and scanned back via record-batch-granular,
    mmap-zero-copy splits; the oracle reads the parquet original, so a
    byte lost anywhere in the IPC round trip hash-fails. The format the
    reference's own schema bytes use (Arrow IPC,
    /root/reference/src/write/writer.rs:137-139) — here as a full table
    format Spark lacks natively."""
    d = arrow_ipc_dir(spark, sf_dir, "part")
    p = spark.read.format("arrowipc").load(d)
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("p_partkey").cast("bigint").alias("key_sum"),
        dsum("p_retailprice").alias("price_sum"),
        F.min("p_name").alias("min_name"),
        F.max("p_size").alias("max_size"),
    )
