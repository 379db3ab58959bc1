"""Relational operator surface (SURVEY.md §2.3) — filters, joins (equi /
semi / anti / non-equi), aggregations, grouping sets, windows, set ops,
scalar functions, subqueries, top-k.

The reference (strawboat) implements no relational operators — its consumer
Databend supplies them (SURVEY.md §2.3); here they are declared Spark-first
and each is paired with a DuckDB oracle. All float aggregation follows the
exact-DECIMAL convention in quiver_spark.functions.

Scale notes (100 TB posture):
- Constant-cardinality dims (region=5, nation=25) are explicitly broadcast —
  no shuffle of the fact table for those joins at any SF. Linearly-scaling
  tables (customer/supplier/part and per-key aggregates derived from them)
  go through tables.maybe_broadcast: the hint fires only under a plan-time
  size ceiling, above it AQE picks the strategy from runtime sizes — a
  forced broadcast of a TB-scale side would be a hard executor OOM.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key, which AQE
  re-plans at runtime; keys are uniform in this dataset (no salting needed).
- Top-k uses orderBy().limit(k) → Spark's TakeOrderedAndProject (no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.functions import (
    DEC_PRICE,
    DEC_RATE,
    revenue,
    SQL_REVENUE,
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dsum,
)
from quiver_spark.registry import register
from quiver_spark.tables import load, maybe_broadcast

# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS sum_disc_price,
       ROUND(CAST(SUM({SQL_REVENUE} * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount', 'decimal(8,4)')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-measure hash aggregate with
    map-side partial aggregation (Spark plans partial+final automatically)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(revenue()).cast("double"), 2).alias("sum_disc_price"),
        F.round(
            F.sum(revenue() * (F.lit(1) + dec("l_tax", DEC_RATE))).cast("double"),
            2,
        ).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount", DEC_RATE).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan-filter-aggregate. The three predicates are
    all Catalyst-pushable into the parquet scan (range + BETWEEN + <)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * dec("l_discount", DEC_RATE)).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "distinct_counts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "rollup_returns",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg", "grouping-sets"),
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag + per-flag-status)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "cube_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "grouping-sets"),
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("total"),
    )


@register(
    "case_when_buckets",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
""",
    tags=("agg", "scalar"),
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing then aggregate (CASE WHEN group keys)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice").alias("total"),
    )


@register(
    "in_between_filter",
    oracle="""
SELECT l_linestatus, COUNT(*) AS cnt
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
GROUP BY l_linestatus
""",
    tags=("filter",),
)
def in_between_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN predicates (both parquet-pushable)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
        )
        .groupBy("l_linestatus")
        .count()
        .withColumnRenamed("count", "cnt")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: dim join + fact join + agg + top-k. customer is
    size-gate broadcast (no shuffle of orders at bench SF; unhinted at
    fleet scale where customer is TB-sized)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
SELECT r_name, n_name, ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS revenue
FROM region, nation, customer, orders, lineitem, supplier
WHERE r_regionkey = n_regionkey
  AND n_nationkey = c_nationkey
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = c_nationkey
GROUP BY r_name, n_name
""",
    tags=("join", "agg", "tpch"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-way join: nation/region broadcast unconditionally
    (constant cardinality), customer/supplier via the size gate; the only
    shuffle at bench SF is orders⋈lineitem on orderkey (+ the final agg)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            maybe_broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"))
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS → left-semi join with a non-trivial join condition."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS revenue, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: who returned the most revenue."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle=f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
GROUP BY o_orderkey, o_custkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(14,4))) > 300
""",
    tags=("join", "agg", "having", "tpch"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: aggregate-then-filter (HAVING) over a fact join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > 300)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("_tq").cast("double").alias("total_qty"),
        )
    )


@register(
    "semi_join_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
    tags=("join", "semi"),
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one finished order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
""",
    tags=("join", "anti"),
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no pending orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "outer_join_coverage",
    oracle="""
SELECT n_name,
       COUNT(c_custkey) AS customers,
       COUNT(s_suppkey) AS suppliers
FROM nation
LEFT JOIN customer ON c_nationkey = n_nationkey
LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("join", "outer"),
)
def outer_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer joins preserving unmatched dimension rows; COUNT(col)
    skips the NULLs the outer join introduces."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("customers"),
            F.count("s_suppkey").alias("suppliers"),
        )
    )


@register(
    "nonequi_acctbal_pairs",
    oracle="""
SELECT n_name, COUNT(*) AS pair_cnt
FROM supplier
JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name
""",
    tags=("join", "nonequi"),
)
def nonequi_acctbal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join condition — Spark keeps the equi part as the
    hash key and applies the range predicate as a post-join filter."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(
            c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------


@register(
    "window_rank_orders",
    oracle="""
SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
""",
    tags=("window",),
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions: top-3 orders per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
""",
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame window (ROWS UNBOUNDED PRECEDING..CURRENT) with a
    fully-specified deterministic order."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_gap",
    oracle="""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS gap_days,
       CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
           AS next_orderkey
FROM orders
""",
    tags=("window", "analytic"),
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytic functions: days since previous order per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap_days"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_ntile_share",
    oracle="""
SELECT quartile,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
FROM (
    SELECT o_totalprice,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
)
GROUP BY quartile
""",
    tags=("window",),
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing over a global order, then aggregate per bucket.

    Scale note: global NTILE is the DECLARED semantics here and is
    inherently a total order — Spark funnels the table through one
    window partition. At fleet scale, exact global quartiles are
    answered instead via distribution windows per key, approximate
    percentiles (agg_quantiles), or histogram-threshold selection
    (sample_token_budget's pattern); this query stays in the surface as
    the exact-semantics reference point."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Sort / top-k / set ops
# --------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("sort", "topk"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort materialization)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "setop_intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "setop_except_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@register(
    "setop_union_counts",
    oracle="""
SELECT nationkey, COUNT(*) AS cnt
FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey FROM supplier
)
GROUP BY nationkey
""",
    tags=("setop", "agg"),
)
def setop_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL then aggregate (party counts per nation)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# --------------------------------------------------------------------------
# Scalar functions & subqueries
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS up,
       LOWER(p_brand) AS lo,
       SUBSTR(p_name, 1, 4) AS pfx,
       LENGTH(p_name) AS len,
       REPLACE(p_name, ' ', '_') AS rep,
       p_brand || '#' || p_type AS cat,
       LPAD(p_brand, 12, '*') AS pad,
       TRIM('  ' || p_name || ' ') AS trimmed,
       CASE WHEN p_name LIKE '%al%' THEN 1 ELSE 0 END AS has_al
FROM part
""",
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level string function battery (all JVM built-ins, codegen'd)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 4).alias("pfx"),
        F.length("p_name").alias("len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.concat_ws("#", "p_brand", "p_type").alias("cat"),
        F.lpad("p_brand", 12, "*").alias("pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.when(F.col("p_name").like("%al%"), 1).otherwise(0).alias("has_al"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate) AS y,
       MONTH(o_orderdate) AS m,
       QUARTER(o_orderdate) AS q,
       DAYOFYEAR(CAST(o_orderdate AS DATE)) AS doy,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
       strftime(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
""",
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level date function battery."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25) AS absdev,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
       CAST(l_quantity AS BIGINT) % 7 AS qmod,
       CAST(POWER(l_quantity, 2) AS DOUBLE) AS qsq,
       CAST(SQRT(l_quantity) AS DOUBLE) AS qsqrt,
       ROUND(CAST(LN(l_extendedprice) AS DOUBLE), 6) AS price_ln,
       GREATEST(l_quantity, 25.0) AS hi,
       LEAST(l_quantity, 25.0) AS lo
FROM lineitem
""",
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level math battery. All deterministic IEEE ops on identical
    inputs (no accumulation), so doubles match bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("absdev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        (q.cast("bigint") % 7).alias("qmod"),
        F.pow(q, 2).alias("qsq"),
        F.sqrt(q).alias("qsqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.greatest(q, F.lit(25.0)).alias("hi"),
        F.least(q, F.lit(25.0)).alias("lo"),
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS cnt
FROM orders
WHERE o_totalprice > (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*)
    FROM orders
)
GROUP BY o_orderstatus
""",
    tags=("subquery", "agg"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The scalar
    aggregate is broadcast (1 row) — no repeated scan per row."""
    o = load(spark, sf_dir, "orders")
    avg_df = o.agg(davg("o_totalprice").alias("_avg"))
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "null_handling",
    oracle="""
SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag,
       COUNT(*) AS cnt,
       COUNT(NULLIF(l_discount, 0.0)) AS nonzero_disc,
       CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_tax
FROM lineitem
GROUP BY 1
""",
    tags=("scalar", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF/COALESCE semantics and NULL-skipping COUNT."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.coalesce(
                F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
            ).alias("flag")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count(F.nullif(F.col("l_discount"), F.lit(0.0))).alias(
                "nonzero_disc"
            ),
            F.sum(F.when(F.col("l_tax") == 0.0, 1).otherwise(0)).alias("zero_tax"),
        )
    )
