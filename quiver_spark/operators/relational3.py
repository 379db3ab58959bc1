"""Third relational battery: more TPC-H query shapes over the driver's
reduced schemas (no partsupp table; lineitem lacks
commitdate/receiptdate/shipmode — queries are adapted to the columns that
exist; Q2/Q11/Q12/Q16/Q20/Q21's shapes live in relational5.py, which
derives the supply relation from lineitem).

All float aggregates follow the exact-decimal convention (registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.functions import SQL_REVENUE, dec, revenue
from quiver_spark.registry import register
from quiver_spark.tables import load, maybe_broadcast


def _li_orders_cust_nation(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return li, o, c, n


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, yr,
       ROUND(CAST(SUM(vol) AS DOUBLE), 2) AS revenue
FROM (
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           date_part('year', CAST(l_shipdate AS DATE)) AS yr,
           {SQL_REVENUE} AS vol
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_3', 'NATION_4')
)
GROUP BY supp_nation, cust_nation, yr
""",
    tags=("join", "agg", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping, adapted): revenue between nation pairs by
    year. Dimension joins broadcast; the fact table shuffles once for the
    final group-by."""
    li, o, c, n = _li_orders_cust_nation(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_4"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
        )
        .agg(F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT yr,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
                           ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT date_part('year', CAST(l_shipdate AS DATE)) AS yr,
           sn.n_name AS supp_nation, {SQL_REVENUE} AS vol
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
GROUP BY yr
""",
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share, adapted): NATION_5's share of ASIA
    PROMO-part revenue by year. The conditional share is a ratio of two
    exact decimal sums — one IEEE division both sides."""
    li, o, c, n = _li_orders_cust_nation(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = n.select("n_nationkey", "n_regionkey")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = revenue()
    zero = F.lit(0).cast("decimal(14,4)")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == cn.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
    )
    return df.groupBy(F.year("l_shipdate").alias("yr")).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)
            ).cast("double")
            / F.sum(vol).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT nation, yr, ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
FROM (
    SELECT n_name AS nation,
           date_part('year', CAST(l_shipdate AS DATE)) AS yr,
           {SQL_REVENUE} AS amount
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
)
GROUP BY nation, yr
""",
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, adapted — no partsupp, so profit is
    the revenue term): red-part revenue by supplier nation and year."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(revenue()).cast("double"), 2).alias("sum_profit"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT ROUND(
    100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE}
                          ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
          / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
""",
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO revenue share for one month."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part")
    vol = revenue()
    zero = F.lit(0).cast("decimal(14,4)")
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
SELECT ROUND(CAST(SUM({SQL_REVENUE}) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
""",
    tags=("join", "filter", "tpch"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted to brand+size brackets):
    disjunctive mixed join/filter predicate — Catalyst splits the common
    l_partkey = p_partkey conjunct out as the join key and evaluates the
    disjunction post-join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(br).agg(
        F.round(F.sum(revenue()).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH pos AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey % 5 AS cgroup,
       COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE), 2) AS totacctbal
FROM customer, pos
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cgroup
""",
    tags=("subquery", "anti", "agg", "tpch"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted): rich customers with no
    RECENT orders (every customer has some order in this testdata), grouped by nation bucket. Scalar subquery broadcast + left-anti
    join against orders.

    The average is the exact decimal sum divided by the count — one IEEE
    division of identical operands on both sides."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dec("c_acctbal"))
                / F.count(F.lit(1))
            ).cast("double").alias("avg_bal")
        )
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_nationkey") % 5).alias("cgroup")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(dec("c_acctbal")).cast("double"), 2).alias("totacctbal"),
    )
