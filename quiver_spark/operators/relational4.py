"""Fourth relational battery: the remaining expressible TPC-H shapes plus
the unpivot operator.

The driver's TPC-H-ish tables omit ``partsupp``, ``l_shipmode``,
``l_commitdate``/``l_receiptdate`` and the comment columns, so canonical
Q2/Q11/Q12/Q16/Q20/Q21 cannot be posed at all; Q13 and Q15 can (Q13 with an
order-priority stand-in for its comment filter). Both are distinct plan
shapes the surface was missing: Q13's two-level aggregate over a filtered
LEFT OUTER join (the "histogram of group sizes" pattern) and Q15's
scalar-max subquery over a reused aggregate view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.functions import SQL_REVENUE, revenue
from quiver_spark.registry import register
from quiver_spark.tables import load, maybe_broadcast


@register(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
    tags=("join", "outer", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution. LEFT OUTER join with a
    filter ON THE JOIN (customers with zero matching orders must survive as
    c_count = 0), then a second aggregation over the first's output — the
    group-size-histogram shape. Both aggregates key on uniform ids
    (c_custkey, then the small c_count domain), so neither shuffle skews at
    scale; COUNT(o_orderkey) counts only matched rows, exactly the outer
    join's null-extension semantics."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("join", "subquery", "agg", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    revenue aggregate is computed once and consumed twice (row source +
    scalar MAX) — expressed as a self-agg cross-joined back, which Spark
    plans as a broadcast of the one-row max. Revenue is an exact decimal
    sum surfaced as double on both engines, so the equality predicate
    compares identical bits. The supplier dimension is broadcast; the only
    corpus-sized shuffle is the l_suppkey aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue()).cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(maybe_broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 50 = 0)
UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
""",
    tags=("unpivot", "reshape"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long reshape): four measure columns become
    (metric, val) rows. Pure map-side row expansion — no shuffle at all;
    the sampled key filter only bounds the oracle compare size."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "scalar_map_funcs",
    # the oracle reproduces the expected VALUES directly — the point is to
    # pin Spark's map construction/merge/higher-order semantics against
    # independently-computed ground truth, not to re-run maps in DuckDB
    oracle="""
SELECT o_orderkey,
       CAST(3 AS INTEGER) AS map_size,
       o_orderstatus AS status_val,
       UPPER(o_orderpriority) AS prio_upper,
       'status,prio,okey' AS keys_csv,
       o_orderstatus || ',' || o_orderpriority || ',' ||
           CAST(o_orderkey AS VARCHAR) AS vals_csv,
       CAST(2 AS INTEGER) AS filtered_size
FROM orders WHERE o_orderkey % 10 = 0
""",
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar-function battery: map_from_arrays, map_concat,
    element_at, transform_values / map_filter (higher-order), map_keys /
    map_values. All JVM built-ins inside whole-stage codegen — per-row map
    manipulation never leaves the executor."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("prio")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    m2 = F.map_concat(
        m,
        F.map_from_arrays(
            F.array(F.lit("okey")),
            F.array(F.col("o_orderkey").cast("string")),
        ),
    )
    return o.select(
        "o_orderkey",
        F.size(m2).alias("map_size"),
        F.element_at(m2, "status").alias("status_val"),
        F.element_at(
            F.transform_values(m2, lambda _k, v: F.upper(v)), "prio"
        ).alias("prio_upper"),
        F.concat_ws(",", F.map_keys(m2)).alias("keys_csv"),
        F.concat_ws(",", F.map_values(m2)).alias("vals_csv"),
        F.size(F.map_filter(m2, lambda k, _v: k != "okey")).alias(
            "filtered_size"
        ),
    )
