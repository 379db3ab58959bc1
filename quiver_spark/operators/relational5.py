"""Fourth relational battery: the remaining TPC-H query SHAPES (Q2, Q11,
Q12, Q16, Q20, Q21), adapted to the driver's reduced schemas. The testdata
has no partsupp table and lineitem lacks commitdate/receiptdate/shipmode,
so each query keeps its defining plan shape — correlated min, fraction-of-
total HAVING, conditional aggregation, NOT-IN distinct count, semi-join
chain, exists/not-exists self-join — with the supply relation derived from
lineitem (per-(part,supplier) aggregates) and "late" derived from
l_shipdate vs o_orderdate. Together with q1/q3-q10/q13-q15/q17(as
correlated_small_quantity)/q18/q19/q22 this completes all 22 TPC-H shapes.

All float aggregates follow the exact-decimal convention (registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.functions import SQL_REVENUE, dec, dsum, revenue
from quiver_spark.registry import register
from quiver_spark.tables import load, maybe_broadcast


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH supply AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           MIN(CAST(l_extendedprice AS DECIMAL(14,4))) AS cost
    FROM lineitem GROUP BY pk, sk
),
mincost AS (SELECT pk AS mpk, MIN(cost) AS mcost FROM supply GROUP BY pk)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       p_partkey, p_brand,
       CAST(cost AS DOUBLE) AS supply_cost
FROM part
JOIN supply   ON p_partkey = pk
JOIN mincost  ON pk = mpk AND cost = mcost
JOIN supplier ON sk = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size = 15
""",
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier, adapted): the supply relation is
    derived from lineitem — per (part, supplier) the minimum observed
    price stands in for ps_supplycost — and the correlated MIN subquery
    keeps Q2's defining shape: for every size-15 part, the supplier(s)
    achieving the per-part minimum cost, decorated with nation.

    Scale shape: the part filter pushes BELOW the supply aggregate as a
    broadcast semi-join, so the (partkey, suppkey) shuffle carries only
    lineitems of qualifying parts (~1/50 of the fact table here — the
    per-part min is unchanged because every lineitem of a kept part is
    kept); the per-part min is a second, strictly smaller aggregate;
    supplier/nation broadcast onto the result. No driver-side anything."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    supply = (
        li.join(
            maybe_broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(dec("l_extendedprice")).alias("cost"))
    )
    mincost = supply.groupBy(F.col("pk").alias("mpk")).agg(
        F.min("cost").alias("mcost")
    )
    return (
        p.join(supply, p.p_partkey == supply.pk)
        .join(
            mincost,
            (F.col("pk") == F.col("mpk")) & (F.col("cost") == F.col("mcost")),
        )
        .join(maybe_broadcast(s), F.col("sk") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


@register(
    "q11_important_supply",
    oracle=f"""
WITH val AS (
    SELECT l_partkey AS pk, SUM({SQL_REVENUE}) AS value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7)
    GROUP BY pk
)
SELECT pk AS p_partkey, ROUND(CAST(value AS DOUBLE), 2) AS value
FROM val,
     (SELECT CAST(SUM(value) AS DOUBLE) * 2.0 / COUNT(*) AS threshold
      FROM val) t
WHERE CAST(value AS DOUBLE) > threshold
""",
    tags=("subquery", "agg", "having", "tpch"),
)
def q11_important_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted): per-part supply value —
    revenue shipped by suppliers of eight nations, standing in for
    ps_supplycost*ps_availqty — filtered to parts whose value exceeds a
    FRACTION OF THE GLOBAL TOTAL (the defining HAVING-scalar-subquery
    shape) — twice the mean per-part share, which unlike TPC-H's fixed
    0.0001/SF fraction stays non-trivial at every scale factor. Sums are
    exact decimals; the threshold comparison happens in double on both
    sides (identical IEEE ops).

    Scale shape: one shuffle for the per-part aggregate; the global total
    re-aggregates the SAME aggregated (part-sized) relation and broadcasts
    back as a 1-row scalar — the fact table is read once."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1, 2, 3, 4, 5, 6, 7)
    )
    val = (
        li.join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(revenue()).alias("value"))
    )
    total = val.agg(
        (
            F.sum("value").cast("double")
            * F.lit(2.0)
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select(
            F.col("pk").alias("p_partkey"),
            F.round(F.col("value").cast("double"), 2).alias("value"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag AS mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY mode
""",
    tags=("join", "agg", "conditional", "tpch"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority, adapted): lineitem
    lacks l_shipmode and the commit/receipt dates, so the "mode" is
    l_returnflag and "late" is shipped more than 60 days after the order
    date — preserving Q12's defining shape: an orders⋈lineitem join with
    CONDITIONAL COUNTS splitting high- from low-priority orders per mode.

    Scale shape: one join shuffle (or broadcast at small orders), one
    3-group aggregate; the CASE evaluation is JVM whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
    tags=("join", "anti", "distinct", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship, adapted): how many distinct
    suppliers ship each (brand, size) combination, excluding a brand and
    excluding "complained-about" suppliers — negative account balance
    stands in for the comment-text filter. The supply relation is again
    lineitem; the NOT IN becomes a left-anti join (its exact semantics
    here: s_suppkey is non-null), keeping Q16's defining
    anti-join + COUNT(DISTINCT) shape.

    Scale shape: the exclusion list is tiny (suppliers) and broadcasts;
    one shuffle for the distinct-count aggregate."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            maybe_broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
WITH shipped AS (
    SELECT l_suppkey AS sk, l_partkey AS pk,
           SUM(CAST(l_quantity AS DECIMAL(14,4))) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY sk, pk
)
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT sk FROM shipped JOIN part ON pk = p_partkey
    WHERE p_name LIKE 'red%' AND CAST(qty AS DOUBLE) > 30.0
)
  AND s_nationkey IN (0, 1, 2, 3, 4)
""",
    tags=("semi", "subquery", "tpch"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted): suppliers in a
    nation set who shipped MORE THAN A THRESHOLD of any 'red'-named part
    in 1998 — shipped quantity from lineitem stands in for ps_availqty vs
    half-year demand. Keeps Q20's defining nested semi-join chain:
    supplier IN (supply-of (parts LIKE ...)) with a per-(supplier,part)
    quantity aggregate in the middle.

    Scale shape: parts filter broadcasts into the shipped aggregate's
    probe side; the qualifying-supplier set is tiny and semi-joins
    (broadcast) against supplier."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1, 2, 3, 4)
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty").cast("double") > 30.0)
        .select("sk")
    )  # no distinct: left_semi already has set semantics
    return s.join(
        maybe_broadcast(shipped), s.s_suppkey == F.col("sk"), "left_semi"
    ).select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH l AS (
    SELECT l_orderkey AS ok, l_suppkey AS sk,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY ok, sk
),
per_order AS (
    SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late
    FROM l GROUP BY ok
)
SELECT s_name, COUNT(*) AS numwait
FROM l
JOIN per_order USING (ok)
JOIN supplier ON sk = s_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
""",
    tags=("exists", "self-join", "agg", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted): on finished
    orders, count per supplier the multi-supplier orders where THEY were
    the only late one — "late" is shipped >30 days after the order date
    (receipt/commit dates don't exist in this schema). The EXISTS /
    NOT-EXISTS pair over lineitem self-joins is decorrelated into
    per-order supplier/late counts — the aggregation form Catalyst
    rewrites the subqueries into, one pass over the data instead of two
    correlated probes. The per-order counts come from an unordered WINDOW
    over the (order,supplier) aggregate, so the reduced relation shuffles
    once on the order key instead of re-aggregating and
    sort-merge-joining back to itself.

    Scale shape: one (order,supplier) aggregate shuffle, one window
    shuffle on the order key over the already-reduced relation, supplier
    broadcast."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    l = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
        )
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("ok")
    flagged = l.select(
        "ok",
        "sk",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    return (
        flagged.filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .join(maybe_broadcast(s), F.col("sk") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "dq_referential_audit",
    oracle="""
SELECT 'orders->customer' AS relation,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS child_rows,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT) AS orphan_children,
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey))
            AS BIGINT) AS childless_parents
UNION ALL
SELECT 'lineitem->orders',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey))
            AS BIGINT)
UNION ALL
SELECT 'lineitem->part',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
            AS BIGINT),
       CAST((SELECT COUNT(*) FROM part p
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_partkey = p.p_partkey))
            AS BIGINT)
""",
    tags=("dq", "join", "anti", "audit"),
)
def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across three foreign-key edges — the
    data-quality sweep a warehouse runs before trusting a snapshot:
    orphaned children (FK target missing — must be zero on a consistent
    TPC-H snapshot, and the audit PROVES it rather than assumes it) and
    childless parents (customers who never ordered — legitimately
    non-zero, which keeps the oracle hash non-trivial).

    Each edge is two anti joins; the dimension side broadcasts under the
    size gate, so the fact tables never shuffle for the orphan checks."""
    from quiver_spark.tables import maybe_broadcast

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")

    def edge(name, child, ckey, parent, pkey):
        pk = parent.select(pkey)
        ck = child.select(ckey)
        return (
            child.join(
                maybe_broadcast(pk), ck[ckey] == pk[pkey], "left_anti"
            )
            .agg(F.count(F.lit(1)).alias("orphan_children"))
            .crossJoin(child.agg(F.count(F.lit(1)).alias("child_rows")))
            .crossJoin(
                parent.join(ck.distinct(), pk[pkey] == ck[ckey], "left_anti")
                .agg(F.count(F.lit(1)).alias("childless_parents"))
            )
            .select(
                F.lit(name).alias("relation"),
                F.col("child_rows").cast("bigint"),
                F.col("orphan_children").cast("bigint"),
                F.col("childless_parents").cast("bigint"),
            )
        )

    return (
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey")
        .unionByName(edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"))
        .unionByName(edge("lineitem->part", li, "l_partkey", part, "p_partkey"))
    )
