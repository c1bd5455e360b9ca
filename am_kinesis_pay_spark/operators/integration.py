"""Integration queries: multi-operator relational pipelines in the
shape of the classic TPC-H workloads, plus correlated-subquery
coverage. These exercise Catalyst end-to-end (join reordering, partial
aggregation, subquery decorrelation, top-k) on one plan rather than
one operator at a time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import dec, dsum


from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "q_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
    tags=("integration",),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered on both fact sides, revenue
    aggregation, deterministic top-10. Catalyst pushes both date
    filters into the scans and reorders the joins; the LIMIT rides a
    TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .limit(10)
    )


@register(
    "q_local_supplier_volume",
    oracle="""
SELECT n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("integration",),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way snowflake join (two broadcast dims + two
    fact joins) with region filter and revenue rollup per nation."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .join(li, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "q_promo_revenue_ratio",
    oracle="""
SELECT
  CAST(100 AS DOUBLE) * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
        ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
    AS promo_revenue_pct,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
""",
    tags=("integration",),
)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional revenue to total revenue —
    a single-pass aggregate with both sums exact-decimal, so the final
    double division is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit("0").cast("decimal(22,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q_large_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
  CAST(agg.total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
) agg
JOIN orders o ON o.o_orderkey = agg.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("integration",),
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (aggregate-then-semi-join), joined back to customers. The aggregate
    runs BEFORE the joins, so only qualifying orderkeys enter the join
    graph — the order-of-operations that keeps Q18 tractable at scale."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(customer, customer.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "subquery_correlated",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
    tags=("integration", "subquery"),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — customers above their nation's
    average balance. Written in SQL form so Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into an aggregate +
    join (SURVEY.md §4.2); comparison on raw doubles is safe because
    both engines compute the same avg over the same per-nation sets...
    via > which tolerates last-ulp only when strict — the predicate
    compares a row value to the group avg, and no c_acctbal sits within
    1e-9 of its nation's avg in the fixtures (asserted in tests)."""
    customer = load(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM customer_v c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "q_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("integration",),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last half-year —
    fact⋈fact⋈dim⋈dim with a selective returnflag filter pushed to the
    lineitem scan and a broadcast nation dim, top-20 by revenue.
    Generalizes the reference's rejected/refund routing
    (kinesis-pay.php:239-249) into a relational 'who rejects' report."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("integration",),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two
    nations — a 6-way join where the same dim (nation) enters twice
    under different roles, with a disjunctive cross-nation predicate
    that Catalyst can only apply after both dim joins. Both nation
    sides broadcast; the two fact joins shuffle on their own keys."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "subquery_exists",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""",
    tags=("integration", "subquery"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter with at least one line item
    shipped after the order date, counted by priority. Written as SQL
    EXISTS so Catalyst's RewritePredicateSubquery turns the correlated
    probe into a left-semi join (a different decorrelation rule than
    the scalar-subquery case in subquery_correlated)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders_v o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem_v l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "q_priority_shipping",
    oracle="""
SELECT l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    tags=("integration",),
)
def q_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact join feeding a conditional CASE
    aggregation (urgent vs non-urgent line counts per linestatus) —
    the shipdate filter pushes to the lineitem scan, the CASE folds
    into the map-side partial aggregate, and the final shuffle carries
    only 2 groups."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


@register(
    "q_disjunctive_revenue",
    oracle="""
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 40 AND l.l_quantity BETWEEN 20 AND 50)
""",
    tags=("integration",),
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: broadcast part⋈lineitem with a 3-way
    disjunction of (brand, size-band, quantity-band) clauses. The
    brand/size legs are part-only, so Catalyst derives a pushable
    part-side filter from the OR (partial predicate extraction) while
    the mixed-table residual evaluates post-join; the join stays a
    broadcast hash join on the equi key."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return j.filter(clause).agg(
        revenue.alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "q_customer_distribution",
    oracle="""
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY n_orders
""",
    tags=("integration",),
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram over a LEFT join with an
    ON-clause filter (not WHERE — customers with zero qualifying orders
    must survive as n_orders = 0, which COUNT(o_orderkey) encodes by
    not counting NULLs). Two aggregations: per-customer (shuffles on
    custkey), then the tiny histogram."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "q_small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
""",
    tags=("integration", "subquery"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of the part's
    average quantity — a correlated scalar AGGREGATE subquery in the
    predicate. Catalyst decorrelates it into a per-part average
    aggregate joined back on partkey; the brand filter broadcasts."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v17")
    load(spark, sf_dir, "part").createOrReplaceTempView("part_v17")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7 AS avg_yearly
        FROM lineitem_v17 l
        JOIN part_v17 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem_v17 l2
            WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "q_dormant_balances",
    oracle="""
WITH positive_avg AS (
  SELECT AVG(c_acctbal) AS v FROM customer WHERE c_acctbal > 0.0
)
SELECT substr(c.c_name, 10, 2) AS cust_bucket,
  COUNT(*) AS n_custs,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, positive_avg
WHERE c.c_acctbal > positive_avg.v
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  )
GROUP BY substr(c.c_name, 10, 2)
""",
    tags=("integration", "subquery"),
)
def q_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO orders,
    bucketed by a name substring — an uncorrelated scalar subquery
    (broadcast single-row cross join) composed with a NOT EXISTS
    anti-join and a post-anti aggregation. Exercises Catalyst's
    anti-join rewrite and scalar-subquery broadcast together."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v22")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v22")
    return spark.sql(
        """
        WITH positive_avg AS (
          SELECT AVG(c_acctbal) AS v FROM customer_v22 WHERE c_acctbal > 0.0
        )
        SELECT substr(c.c_name, 10, 2) AS cust_bucket,
          COUNT(*) AS n_custs,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer_v22 c, positive_avg
        WHERE c.c_acctbal > positive_avg.v
          AND NOT EXISTS (
            SELECT 1 FROM orders_v22 o WHERE o.o_custkey = c.c_custkey
          )
        GROUP BY substr(c.c_name, 10, 2)
        """
    )


@register(
    "q_important_parts",
    oracle="""
WITH part_value AS (
  SELECT l_partkey,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
FROM part_value
WHERE value > (
  SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 0.0005
  FROM lineitem
)
""",
    tags=("integration", "subquery"),
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value filtered against a
    fraction of the GLOBAL total — a HAVING predicate over an
    uncorrelated scalar aggregate subquery. Both aggregates compute in
    exact DECIMAL (one grouped pass + one global pass over the same
    scan), so the threshold comparison is engine-identical."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v11")
    return spark.sql(
        """
        WITH part_value AS (
          SELECT l_partkey,
            SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS value
          FROM lineitem_v11 GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
        FROM part_value
        WHERE value > (
          SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 0.0005
          FROM lineitem_v11
        )
        """
    )


@register(
    "q_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT MAX(total) FROM revenue)
""",
    tags=("integration", "subquery"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — argmax over an aggregate via a reused CTE: the revenue
    aggregation feeds both the join and the scalar MAX subquery.
    Equality on the exact DECIMAL total (not a rounded double) keeps
    the argmax tie semantics identical across engines."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v15")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v15")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total
          FROM lineitem_v15
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
        FROM supplier_v15 s
        JOIN revenue r ON r.l_suppkey = s.s_suppkey
        WHERE r.total = (SELECT MAX(total) FROM revenue)
        """
    )


@register(
    "q_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type
""",
    tags=("integration", "subquery"),
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type)
    excluding a NOT IN supplier blacklist — NOT IN compiles to a
    null-aware anti join (stricter than NOT EXISTS: one NULL in the
    subquery empties the result), composed with negated LIKE pushdown
    and COUNT(DISTINCT) over a join."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v16")
    load(spark, sf_dir, "part").createOrReplaceTempView("part_v16")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v16")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem_v16 l
        JOIN part_v16 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND p.p_type NOT LIKE 'MEDIUM%'
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier_v16 WHERE s_acctbal < 0.0
          )
        GROUP BY p.p_brand, p.p_type
        """
    )


@register(
    "q_nation_profit",
    oracle="""
SELECT n.n_name AS nation,
  CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
         - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(3,1))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
""",
    tags=("integration",),
)
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over a 5-way
    join with a substring filter on part names (0.6 x retailprice
    stands in for the missing ps_supplycost). The LIKE pushes to the
    part scan, nation broadcasts, and the profit expression stays in
    exact DECIMAL until the output cast."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit("0.6").cast("decimal(3,1)")
    ).cast("double")
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(profit.alias("profit"))
    )


@register(
    "q_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""",
    tags=("integration",),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the all-pushdown query — every predicate
    (date range, discount band, quantity cap) reaches the parquet
    scan and the single global aggregate needs no grouping shuffle.
    The what-if revenue delta from removing small discounts."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_market_share",
    oracle="""
WITH all_sales AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
    n.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM all_sales
GROUP BY o_year
""",
    tags=("integration",),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's purchase volume
    per year — a 7-way join (nation enters twice: supplier side for the
    share numerator, customer side routed through region for the
    market scope) feeding a conditional-sum ratio. Both DECIMAL sums
    convert to DOUBLE before the division so the ratio is
    engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_supp = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    sales = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("nc_region"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return sales.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q_min_cost_supplier",
    oracle="""
SELECT l.l_partkey, s.s_suppkey, s.s_name,
  round(CAST(MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)) / CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS unit_price
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE l.l_partkey <= 100
GROUP BY l.l_partkey, s.s_suppkey, s.s_name
HAVING MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)) / CAST(l.l_quantity AS DECIMAL(18,2))) = (
  SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)) / CAST(l2.l_quantity AS DECIMAL(18,2)))
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
""",
    tags=("integration", "subquery"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp adapted to lineitem unit prices): for
    each part, the supplier(s) whose best unit price equals the
    part-wide minimum — a correlated scalar MIN subquery against the
    same table that feeds the outer aggregate. Catalyst decorrelates
    to a per-part min joined back on partkey; equality compares exact
    DECIMAL quotients, rounded only at output."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v2")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v2")
    return spark.sql(
        """
        SELECT l.l_partkey, s.s_suppkey, s.s_name,
          round(CAST(MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)) / CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS unit_price
        FROM lineitem_v2 l
        JOIN supplier_v2 s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_partkey <= 100
        GROUP BY l.l_partkey, s.s_suppkey, s.s_name
        HAVING MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)) / CAST(l.l_quantity AS DECIMAL(18,2))) = (
          SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)) / CAST(l2.l_quantity AS DECIMAL(18,2)))
          FROM lineitem_v2 l2 WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


@register(
    "q_excess_shippers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
  )
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 400
)
""",
    tags=("integration", "subquery"),
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of red parts — nested IN subqueries (part name filter
    inside the supplier filter), each rewritten by Catalyst to a
    semi join; the inner aggregate runs before the outer probe."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v20")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v20")
    load(spark, sf_dir, "part").createOrReplaceTempView("part_v20")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier_v20 s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem_v20 l
          WHERE l.l_partkey IN (
            SELECT p_partkey FROM part_v20 WHERE p_name LIKE '%red%'
          )
          GROUP BY l.l_suppkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 400
        )
        """
    )


@register(
    "q_sole_late_shipper",
    oracle="""
SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
""",
    tags=("integration", "subquery"),
)
def q_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (commitdate adapted to a 60-day lateness rule):
    suppliers who were the ONLY late shipper on finalized multi-supplier
    orders — an EXISTS (other suppliers participated) composed with a
    NOT EXISTS (none of them was also late), both correlated on the
    same fact table: semi join + anti join against lineitem in one
    plan."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v21")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v21")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v21")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
        FROM supplier_v21 s
        JOIN lineitem_v21 l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders_v21 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem_v21 l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_v21 l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        """
    )


@register(
    "events_funnel_ordered",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM s1) AS n_viewed,
  (SELECT COUNT(*) FROM s2) AS n_clicked_after,
  (SELECT COUNT(*) FROM s3) AS n_purchased_after,
  CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
    / (SELECT COUNT(*) FROM s1) AS full_conversion_rate
""",
    tags=("integration", "funnel"),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, each step
    strictly after the previous one's first occurrence) — the classic
    product-analytics windowFunnel. Each stage is one filtered
    aggregation joined to the previous stage's (user, first-ts) — three
    small hash aggregations keyed by user_id; the per-stage frontier is
    one row per user, so stage state stays tiny however large the raw
    event volume is, and every join key is the same user_id so one
    repartition is reused across stages."""
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_viewed"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .withColumn(
            "full_conversion_rate",
            F.col("n_purchased_after").cast("double") / F.col("n_viewed"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(date_trunc('week', e.ts) AS DATE) AS active_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, active_week,
  CAST(COUNT(*) AS BIGINT) AS n_active_users,
  CAST((active_week - cohort_week) / 7 AS BIGINT) AS weeks_since_cohort
FROM activity
GROUP BY cohort_week, active_week
""",
    tags=("integration", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics view:
    users bucketed by first-seen week, counted per week they remain
    active. First-seen is one per-user aggregation (tiny frontier, like
    the funnel); the cohort join is on user_id so it reuses the same
    shuffle key; the distinct collapses to (user, week) before the
    final count, so the matrix aggregation sees at most
    users × active-weeks rows regardless of raw event volume."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.to_date(F.date_trunc("week", "ts")).alias("active_week"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "active_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_users"),
        (F.datediff("active_week", "cohort_week") / 7)
        .cast("bigint")
        .alias("weeks_since_cohort"),
    )


@register(
    "events_conversion_lag",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS conv_ts,
    MIN(s.signup_ts) AS signup_ts
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts
  GROUP BY e.user_id
), conv AS (
  SELECT (epoch_us(conv_ts) - epoch_us(signup_ts)) // 86400000000
    AS days_to_convert
  FROM c
), histo AS (
  SELECT CAST(days_to_convert AS BIGINT) AS days_to_convert,
    CAST(COUNT(*) AS BIGINT) AS n_users
  FROM conv GROUP BY 1
), unconv AS (
  SELECT CAST(-1 AS BIGINT) AS days_to_convert,
    CAST(COUNT(*) AS BIGINT) AS n_users
  FROM s WHERE user_id NOT IN (SELECT user_id FROM c)
)
SELECT * FROM histo
UNION ALL
SELECT * FROM unconv WHERE n_users > 0
""",
    tags=("integration", "retention"),
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion histogram — signup to first subsequent
    purchase, bucketed by whole days, with never-converted users as
    the -1 bucket. The lag is integer microsecond arithmetic
    (unix_micros diff, integer div) so the histogram keys are exact on
    both engines. Plan shape: two per-user aggregations sharing the
    user_id shuffle key + one broadcast-sized anti join for the
    unconverted bucket — event volume only ever crosses the wire
    keyed by user_id."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("conv_ts"),
            F.min("signup_ts").alias("signup_ts"),
        )
    )
    histo = (
        c.select(
            F.expr(
                "(unix_micros(conv_ts) - unix_micros(signup_ts))"
                " div 86400000000"
            ).alias("days_to_convert")
        )
        .groupBy("days_to_convert")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    unconv = (
        s.join(c.select("user_id"), "user_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.lit(-1).cast("bigint").alias("days_to_convert"), "n_users"
        )
        .filter(F.col("n_users") > 0)
    )
    return histo.unionByName(unconv)


@register(
    "events_gapfill_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1 FROM events
), calendar AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), grid AS (
  SELECT c.day, t.event_type
  FROM calendar c, (SELECT DISTINCT event_type FROM events) t
)
SELECT g.day, g.event_type,
  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
  CAST(COALESCE(d.s, 0) AS DOUBLE) AS sum_value,
  CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
""",
    tags=("integration", "timeseries"),
)
def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series (the time_bucket_gapfill counterpart to
    agg_time_rollup): densify the (day x event_type) grid from the
    observed time bounds, zero-filling days with no events and flagging
    them. The calendar is generated from a 1-row bounds aggregate
    (sequence + explode — rows created engine-side, never collected)
    and the grid side is tiny (days x types), so it broadcasts against
    the daily aggregate; the fact table is read once."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    grid = calendar.crossJoin(types)
    return (
        F.broadcast(grid)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        )
    )


@register(
    "ts_user_similarity",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
), q AS (
  SELECT d, v AS qv FROM daily WHERE user_id = 1
), sims AS (
  SELECT o.user_id,
    round(corr(o.v, q.qv), 6) AS sim,
    COUNT(*) AS n_days
  FROM daily o JOIN q USING (d)
  WHERE o.user_id <> 1
  GROUP BY o.user_id
  HAVING COUNT(*) >= 10 AND corr(o.v, q.qv) IS NOT NULL
)
SELECT user_id, sim, n_days FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sim DESC, user_id) AS rnk
  FROM sims) t
WHERE rnk <= 10
""",
    tags=("integration", "timeseries"),
)
def ts_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the streaming-similarity workload
    from PAPERS.md's EDBT-2019 entry, batch form): each user's daily
    spend series is correlated against a query user's series on the
    days both were active; the 10 most-correlated users win. Plan
    shape: one grouped aggregation builds every series in parallel,
    the query user's ~30-row series broadcasts back onto it, and
    corr() reduces per candidate — comparing the query against ALL
    users costs one shuffle + one broadcast regardless of user count.
    The exact-decimal daily sums make corr's inputs engine-identical;
    6-dp rounding absorbs the remaining accumulation-order ulps."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(dsum("value").alias("v"))
    q = daily.filter(F.col("user_id") == 1).select(
        "d", F.col("v").alias("qv")
    )
    sims = (
        daily.filter(F.col("user_id") != 1)
        .join(F.broadcast(q), "d")
        .groupBy("user_id")
        .agg(
            F.round(F.corr("v", "qv"), 6).alias("sim"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter((F.col("n_days") >= 10) & F.col("sim").isNotNull())
    )
    # top-k via orderBy+limit, NOT a global row_number window: this
    # plans TakeOrderedAndProject (per-partition heaps, no single-task
    # sort), which holds however many candidate users exist
    return (
        sims.orderBy(F.desc("sim"), F.asc("user_id"))
        .limit(10)
        .select("user_id", "sim", "n_days")
    )


@register(
    "graph_pagerank",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events WHERE event_type = 'purchase' AND value > 250) a
  JOIN (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events WHERE event_type = 'purchase' AND value > 250) b
    USING (d)
  WHERE a.user_id <> b.user_id
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), n AS (
  SELECT COUNT(DISTINCT src) AS n_nodes FROM edges
), r1 AS (
  SELECT e.dst AS user_id,
    (150000000000000000 // n.n_nodes)
      + 17 * (CAST(SUM((1000000000000000000 // n.n_nodes) // d.outdeg)
              AS BIGINT) // 20)
      + (17 * (CAST(SUM((1000000000000000000 // n.n_nodes) // d.outdeg)
              AS BIGINT) % 20)) // 20 AS rank_fp
  FROM edges e JOIN deg d USING (src) CROSS JOIN n
  GROUP BY e.dst, n.n_nodes
), r2 AS (
  SELECT e.dst AS user_id,
    (150000000000000000 // n.n_nodes)
      + 17 * (CAST(SUM(r.rank_fp // d.outdeg) AS BIGINT) // 20)
      + (17 * (CAST(SUM(r.rank_fp // d.outdeg) AS BIGINT) % 20)) // 20
      AS rank_fp
  FROM edges e JOIN deg d USING (src) JOIN r1 r ON r.user_id = e.src
  CROSS JOIN n
  GROUP BY e.dst, n.n_nodes
)
SELECT user_id, CAST(rank_fp AS BIGINT) AS pagerank_fp FROM r2
""",
    tags=("integration", "graph"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 fixed iterations, damping 0.85) over the
    co-purchase graph — users linked when they bought on the same day.
    The canonical iterative-graph workload: each round is one join of
    the edge list against the current rank vector plus one aggregation
    by destination. The rank frame is node-sized (broadcast here;
    partition-aligned with the edge list's src key at 100 TB so each
    round is ONE shuffle), and the undirected co-occurrence
    construction leaves no dangling nodes, so mass only moves along
    edges. Fixed iteration count keeps it SQL-expressible for the
    oracle; production convergence loops the same two operators with
    localCheckpoint every round (the text_dedup_clusters discipline).

    Arithmetic is FIXED-POINT: ranks are integers in 1e-18 units, all
    steps are integer div/mod (damping 0.85 = x*17 div 20, split as
    17*(m div 20) + (17*(m mod 20)) div 20 to stay inside int64).
    Floating-point PageRank is not reproducible across engines — at
    sf0.1 five symmetric users' true ranks sit EXACTLY on the round(9)
    midpoint (0.0081934375), so ulp-level reduction-order noise flips
    the 9th digit; integer fixed-point makes every intermediate exact
    and order-independent on any engine, at <1e-15 relative error vs
    the real-valued recurrence. Output is the fixed-point integer
    (pagerank_fp; divide by 1e18 for display)."""
    ev = load(spark, sf_dir, "events")
    active = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 250))
        .select(
            F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
        )
        .distinct()
    )
    b = active.select(F.col("d"), F.col("user_id").alias("dst"))
    edges = (
        active.select("d", F.col("user_id").alias("src"))
        .join(b, "d")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = edges.select("src").distinct().agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    # fixed-point: ranks in 1e-18 units, integer ops only (see docstring)
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "src", F.expr("1000000000000000000L div n_nodes").alias("rank_fp")
    )
    ed = edges.join(deg, "src")
    for _ in range(2):
        contrib = ed.join(F.broadcast(ranks), "src").select(
            F.col("dst"), F.expr("rank_fp div outdeg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("mass"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("src"),
                F.expr(
                    "150000000000000000L div n_nodes"
                    " + 17L * (mass div 20)"
                    " + (17L * (mass % 20)) div 20"
                ).alias("rank_fp"),
            )
        )
    return ranks.select(
        F.col("src").alias("user_id"), F.col("rank_fp").alias("pagerank_fp")
    )


_REACH_EDGES_SQL = """
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
          FROM {events} WHERE event_type = 'purchase' AND value > 150) a
    JOIN (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
          FROM {events} WHERE event_type = 'purchase' AND value > 150) b
      USING (d)
    WHERE a.user_id <> b.user_id
"""

_REACH_SQL = """
WITH RECURSIVE reach(node, depth) AS (
  SELECT (SELECT MIN(src) FROM ({edges}) s) AS node, 0 AS depth
  UNION ALL
  SELECT e.dst, r.depth + 1
  FROM reach r
  JOIN ({edges}) e ON e.src = r.node
  WHERE r.depth < 2
)
SELECT node, MIN(depth) AS min_depth
FROM reach
GROUP BY node
"""


@register(
    "graph_reachability",
    oracle=_REACH_SQL.format(edges=_REACH_EDGES_SQL.format(events="events")),
    tags=("integration", "graph"),
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability (≤ 2 hops, min depth per node) from the
    smallest-id node of the co-purchase graph, written as a Spark 4
    recursive CTE (`WITH RECURSIVE`) — the same SQL text runs on the
    DuckDB oracle. The recursive member is one equi-join of the
    current frontier against the edge list per iteration; the depth
    guard bounds iterations, and the final GROUP BY collapses repeated
    visits to the first (minimum) depth. At 100 TB the edge list would
    be bucketed by src so each frontier expansion is a shuffle-free
    join; the frontier itself stays node-bounded. Generalizes the
    iterative min-label propagation of text_dedup_clusters to
    arbitrary-depth graph traversal in declarative form.

    r12 OPT (guide §3.3/§5): the edge CTE's text appears twice in the
    query (the anchor's MIN(src) subquery and the recursive member)
    and CTE inlining re-plans the distinct + self-join edge build per
    reference, with the recursion re-reading it per iteration. The
    edge list is now materialized ONCE (localCheckpoint — the
    'bucketed edge table' the scale note promises) and the SAME
    recursive SQL runs over the materialized view; the oracle keeps
    the fully-inlined text, so the hash match proves equivalence."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_v_reach")
    edges = spark.sql(
        _REACH_EDGES_SQL.format(events="events_v_reach")
    ).localCheckpoint()
    edges.createOrReplaceTempView("reach_edges_v")
    return spark.sql(
        _REACH_SQL.format(edges="SELECT src, dst FROM reach_edges_v")
    )


_CC_MAX_ROUNDS = 50
# Per-day participation cap for the CC edge build (deterministic md5
# order — the _TRI_DAY_CAP pattern): day-clique edge generation is
# quadratic in daily actives, so the cap is the volume knob that keeps
# the edge list linear in days at any replication factor. Mirrored in
# the oracle.
_CC_DAY_CAP = int(os.environ.get("AKPS_CC_DAY_CAP", "256"))

_CC_EDGES_SQL = f"""
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM (SELECT d, user_id FROM (
            SELECT d, user_id,
              ROW_NUMBER() OVER (PARTITION BY d
                ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
            FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                         user_id
                  FROM events
                  WHERE event_type = 'purchase' AND value > 150) du) c
          WHERE rn <= {_CC_DAY_CAP}) a
    JOIN (SELECT d, user_id FROM (
            SELECT d, user_id,
              ROW_NUMBER() OVER (PARTITION BY d
                ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
            FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                         user_id
                  FROM events
                  WHERE event_type = 'purchase' AND value > 150) du) c
          WHERE rn <= {_CC_DAY_CAP}) b
      USING (d)
    WHERE a.user_id <> b.user_id
"""

_CC_ORACLE = (
    "WITH RECURSIVE edges AS ("
    + _CC_EDGES_SQL
    + """
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), reach(node, other) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other
)
SELECT node, MIN(other) AS component
FROM reach
GROUP BY node
"""
)


@register(
    "graph_cc_pointer_doubling",
    oracle=_CC_ORACLE,
    tags=("integration", "graph", "iterative"),
)
def graph_cc_pointer_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    jumping (the large-star/small-star family, Kiveris et al. 2014
    "Connected Components in MapReduce and Beyond"): each round first
    adopts the min label among self + neighbors (one hop), then
    replaces every label by its label's label (label[label] — the
    pointer jump). Propagation alone needs O(diameter) rounds — the
    documented failure mode of _min_label_components on path-shaped
    graphs; the jump halves pointer chains each round, so convergence
    is O(log n) regardless of diameter. This is the scale path the
    label-propagation docstrings promise; registered over the same
    co-purchase graph as graph_reachability, oracle = recursive-CTE
    transitive closure with min-label collapse.

    Invariant that makes the jump safe: labels only ever decrease and
    label[x] <= x (a node's label is itself or something smaller), so
    label[label[x]] <= label[x] and the jump can never skip past the
    component minimum. Each round is two joins + one aggregation on
    the (node, label) frame, localCheckpointed to cut lineage; the
    frame is O(nodes), never O(edges)."""
    edges = _cc_edges(spark, sf_dir)
    labels, _rounds = pointer_doubling_components(edges)
    return labels.select("node", F.col("lbl").alias("component"))


def _cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared co-purchase edge set (symmetric, day-capped — the
    Spark twin of _CC_EDGES_SQL) used by graph_cc_pointer_doubling and
    graph_label_propagation. Memoized via session_artifact (r11 OPT,
    the _materialized_edges convention): both consumers are ITERATIVE
    — label_propagation references the edge frame in every one of its
    3 rounds and pointer doubling in every hop join — so the pre-r11
    shape re-ran the distinct + day-cap window + day self-join once
    per round per call. At 100 TB the edge list is a persisted input
    maintained once and probed by every consumer."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    def build() -> DataFrame:
        from pyspark.sql import Window as W

        ev = load(spark, sf_dir, "events")
        day_users = (
            ev.filter(
                (F.col("event_type") == "purchase") & (F.col("value") > 150)
            )
            .select(
                F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
            )
            .distinct()
        )
        w_day = W.partitionBy("d").orderBy(
            F.md5(F.col("user_id").cast("string")), "user_id"
        )
        capped = (
            day_users.withColumn("rn", F.row_number().over(w_day))
            .filter(F.col("rn") <= _CC_DAY_CAP)
            .drop("rn")
        )
        a = capped.select("d", F.col("user_id").alias("src"))
        b = capped.select("d", F.col("user_id").alias("dst"))
        return (
            a.join(b, "d")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )

    return session_artifact(
        spark,
        f"akps_cc_edges_{sf_tag(sf_dir)}",
        build,
        "src bigint, dst bigint",
    )


def pointer_doubling_components(edges: DataFrame) -> tuple[DataFrame, int]:
    """Min-label connected components with pointer jumping over a
    SYMMETRIC (src, dst) edge list; returns (labels(node, lbl), rounds
    used). Split out from graph_cc_pointer_doubling so tests can pin
    the O(log n) round count on a path graph directly.

    Job shape (r12 OPT, guide §2.4/§3.1/§5): the labels frame is
    BOUNDED by construction for every caller (the day-capped edge set:
    <= _CC_DAY_CAP nodes per day, ~16 bytes each — a few MB even at
    100 TB of events), so each round broadcasts labels ONCE and both
    the hop lookup and the pointer-jump lookup probe that same
    broadcast (identical build subtree -> one ReusedExchange build):
    the O(edges) frame is never shuffled in any round, and the only
    per-round shuffle is the partial-aggregated min-label rollup by
    src. The own-label lookup and the pointer jump are two more probes
    of that same broadcast (every node is a src of the symmetric edge
    set, so the inner joins are total). The jump reads the
    START-of-round labels (the broadcast in hand) rather than the
    post-hop labels; both variants only ever move labels downward and
    share the same fixed points (a stable labeling is per-component
    constant, and the component minimum's own label is pinned at
    itself), so the converged result is identical — the stale read
    trades at most a few extra rounds for single-shuffle,
    single-broadcast rounds."""
    edges = edges.persist()
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .localCheckpoint()
        )
        for it in range(_CC_MAX_ROUNDS):
            lab = F.broadcast(labels)
            # hop part 1: min start-of-round label over the neighbors
            nbr = (
                edges.join(lab, edges.dst == lab.node)
                .groupBy(F.col("src"))
                .agg(F.min("lbl").alias("nl"))
            )
            # hop part 2: fold in the node's own label (probe #2 of the
            # same broadcast; prev_lbl is the convergence reference —
            # a full hop+jump round that changes nothing is converged)
            hopped = nbr.join(lab, nbr.src == lab.node).select(
                "src",
                F.col("lbl").alias("prev_lbl"),
                F.least(F.col("nl"), F.col("lbl")).alias("hop_lbl"),
            )
            # pointer jump: lbl <- label[hop_lbl] (probe #3; hop_lbl is
            # always a live node id: labels are node ids and only ever
            # decrease within the component)
            jumped = (
                hopped.join(lab, hopped.hop_lbl == lab.node)
                .select(
                    F.col("src").alias("node"),
                    "prev_lbl",
                    F.col("lbl"),
                )
                .localCheckpoint()
            )
            labels = jumped.select("node", "lbl")
            if it > 0:
                changed = len(
                    jumped.filter(F.col("prev_lbl") != F.col("lbl"))
                    .take(1)
                )
                if changed == 0:
                    return labels, it + 1
        raise RuntimeError(
            f"pointer-doubling CC did not converge in {_CC_MAX_ROUNDS} "
            "rounds"
        )
    finally:
        edges.unpersist()


@register(
    "events_anomaly_rate_spike",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE)
),
stats AS (
  SELECT d, n,
    avg(n) OVER w AS trail_avg,
    stddev_samp(n) OVER w AS trail_sd,
    COUNT(*) OVER w AS trail_n
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, n, round(trail_avg, 6) AS trail_avg,
       (n > trail_avg + 3 * trail_sd) AS is_spike
FROM stats
WHERE trail_n = 7
""",
    tags=("integration", "anomaly"),
)
def events_anomaly_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate spike detection: each day's volume vs a TRAILING
    window of the previous 7 days (frame ends at 1 PRECEDING — today
    must not contaminate its own baseline); spike = mean + 3σ breach.
    The monitoring companion to agg_anomaly_mad (values) and
    win_out_of_order_profile (lateness): this one watches throughput —
    the reference's poll-cadence health question (is something
    hammering /status?, kinesis-pay.php:263,302-304) asked of the
    whole pipeline. Daily pre-aggregation first, so the window runs
    over days, not events; the global ORDER BY window is safe because
    its input is O(days)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.orderBy("d").rowsBetween(-7, -1)
    stats = daily.select(
        "d",
        "n",
        F.avg("n").over(w).alias("trail_avg"),
        F.stddev_samp("n").over(w).alias("trail_sd"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return stats.filter(F.col("trail_n") == 7).select(
        "d",
        "n",
        F.round("trail_avg", 6).alias("trail_avg"),
        (F.col("n") > F.col("trail_avg") + 3 * F.col("trail_sd")).alias(
            "is_spike"
        ),
    )


@register(
    "events_path_analysis",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
    lead(event_type, 1) OVER w AS step2,
    lead(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || ' > ' || step2 || ' > ' || step3 AS path
  FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
),
counted AS (
  SELECT path, COUNT(*) AS n_occurrences FROM paths GROUP BY path
),
ranked AS (
  SELECT path, n_occurrences,
    CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path) AS INT) AS rank
  FROM counted
)
SELECT path, n_occurrences, rank FROM ranked WHERE rank <= 10
""",
    tags=("integration", "sequence"),
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining lite: the 10 most common 3-step event paths
    across all users (sliding trigram over each user's ordered
    stream). The population-level generalization of the reference's
    fixed poll→status→redirect flow (kinesis-pay.php:231-268): which
    journeys actually happen, and in what volume. One window shuffle
    on user_id builds every trigram in-place (two leads share the
    partition sort — no self-joins for n-grams); the count aggregation
    then shuffles only distinct paths (bounded by |event_types|^3),
    and the final top-10 runs on that tiny frame. (ts, event_id)
    ordering makes trigram formation deterministic under ties."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
    counted = (
        seq.select(
            F.concat_ws(" > ", "event_type", "step2", "step3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w2 = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 10)
        .select("path", "n_occurrences", "rank")
    )


# Triangle-count graph: same co-purchase construction as graph_pagerank
# but a lower value threshold so the smallest SF still has a triangle.
_TRI_THR = 120
# Per-day participant cap: the co-purchase graph is a union of daily
# cliques, so an uncapped hot day (millions of same-day purchasers)
# materializes O(n^2) edges before any triangle logic runs. The cap
# keeps the densest day's edge contribution <= CAP^2, chosen in
# deterministic md5-of-id order so both engines (and reruns) pick the
# same participants. 128 never binds at the test SFs (sf0.1 maxes at
# 75 purchasers/day) but bounds a 100 TB hot day — and DOES bind in
# the tools/stress.py 10x replication, which is the point: replicated
# overlapping ids make every daily clique ~10x denser, and without the
# cap the data genuinely holds 799M triangles (737M even capped at
# 512) — throughput-bound no matter how wedges are oriented. A union
# of daily cliques has ~days*C(cap,3) triangles, so the cap is THE
# exactness/volume knob; 128 keeps the 10x stress at 14M triangles
# (6.5 s, vs 108 s uncapped in round 2).
_TRI_DAY_CAP = int(os.environ.get("AKPS_TRI_DAY_CAP", "128"))

# Shared SQL prefix: deterministic capped per-day actives -> distinct
# undirected edge list (s < t).
_TRI_EDGE_CTE = f"""
a0 AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
  FROM events WHERE event_type = 'purchase' AND value > {_TRI_THR}
), a AS (
  SELECT d, user_id FROM (
    SELECT d, user_id, ROW_NUMBER() OVER (
      PARTITION BY d ORDER BY md5(CAST(user_id AS VARCHAR)), user_id
    ) AS rn FROM a0
  ) WHERE rn <= {_TRI_DAY_CAP}
), e AS (
  SELECT DISTINCT x.user_id AS s, y.user_id AS t
  FROM a x JOIN a y USING (d)
  WHERE x.user_id < y.user_id
)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str, day_cap: int) -> DataFrame:
    """Distinct co-purchase edges (s < t), per-day participation capped
    at ``day_cap`` in deterministic md5-of-id order. One shuffle on day
    for the cap window, one day-keyed self-join (bounded by the cap),
    one pair-keyed distinct."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    active = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > _TRI_THR)
        )
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id")
        .distinct()
    )
    capped = (
        active.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("d").orderBy(
                    F.md5(F.col("user_id").cast("string")), "user_id"
                )
            ),
        )
        .filter(F.col("rn") <= day_cap)
        .select("d", "user_id")
    )
    return (
        capped.select("d", F.col("user_id").alias("s"))
        .join(capped.select("d", F.col("user_id").alias("t")), "d")
        .filter(F.col("s") < F.col("t"))
        .select("s", "t")
        .distinct()
    )


def _oriented_triangles(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle enumeration (Suri–Vassilvitskii): orient
    every undirected edge toward the higher-(degree, id) endpoint, form
    wedges only at each edge's LOWER-degree vertex, close with one
    equi-join. Out-degree in the oriented graph is <= sqrt(2m), so
    generated wedges are bounded by sum(min_deg^2) — a hub with degree
    d contributes O(sqrt(m)) wedges, not O(d^2). Each triangle
    {a,b,c} appears exactly once: as the wedge at its minimum-order
    corner, closed by the one oriented (b,c) edge. Returns (na,nb,nc)
    rows. All joins are ids-only equi-joins (8-byte keys; no payloads,
    no cross products)."""
    deg = (
        edges.select(F.col("s").alias("v"))
        .unionAll(edges.select(F.col("t").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Total order key: (degree, id) packed into one long. user_id fits
    # in 32 bits at every SF; degree < 2^31 long before the edge list
    # itself would be unstorable.
    keyed = deg.select(
        "v",
        (
            F.col("deg").cast("long") * F.lit(4294967296).cast("long")
            + F.col("v").cast("long")
        ).alias("k"),
    )
    ek = edges.join(
        keyed.select(F.col("v").alias("s"), F.col("k").alias("ks")), "s"
    ).join(keyed.select(F.col("v").alias("t"), F.col("k").alias("kt")), "t")
    low_first = F.col("ks") < F.col("kt")
    # Explicit-N repartition on the wedge key: the edge list is SMALL
    # relative to the wedges it fans out into (a capped daily clique
    # multiplies rows ~170x through the next two joins), so AQE's
    # size-based coalescing — and the broadcast-join pipelining it
    # triggers — would funnel the entire fan-out through one task.
    # Pinning the pre-fan-out partitioning by u keeps the explosion
    # parallel; the fixed N is honored (AQE never coalesces an
    # explicit-count repartition). Measured: 440 s -> 6 s at the 10x
    # stress.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    oriented = ek.select(
        F.when(low_first, F.col("s")).otherwise(F.col("t")).alias("u"),
        F.when(low_first, F.col("t")).otherwise(F.col("s")).alias("w"),
        F.greatest("ks", "kt").alias("kw"),
    ).repartition(n_part, "u")
    w1 = oriented.select("u", F.col("w").alias("b"), F.col("kw").alias("kb"))
    w2 = oriented.select("u", F.col("w").alias("c"), F.col("kw").alias("kc"))
    wedges = w1.join(w2, "u").filter(F.col("kb") < F.col("kc"))
    closing = oriented.select(F.col("u").alias("b"), F.col("w").alias("c"))
    return wedges.join(closing, ["b", "c"]).select(
        F.col("u").alias("na"), F.col("b").alias("nb"), F.col("c").alias("nc")
    )


def _materialized_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped edge list as a session-scoped scratch-parquet memo: the
    triangle pipeline references the edges five times (degree count,
    two orientation joins, wedge pair, closing probe) and a leaked
    ``.persist()`` would accumulate executor memory across a
    200+-query sweep. Memoized via session_artifact (r10 — previously
    rebuilt per CALL, which contradicted this docstring's own claim
    and made both triangle entries pay a full edge build + parquet
    write on every run): at 100 TB the edge list is a persisted input
    maintained once and probed by every consumer — the same shape as
    the sign-LSH signature artifacts."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    return session_artifact(
        spark,
        f"akps_tri_edges_{sf_tag(sf_dir)}",
        lambda: _copurchase_edges(spark, sf_dir, _TRI_DAY_CAP),
    )


@register(
    "graph_triangle_count",
    oracle=f"""
WITH {_TRI_EDGE_CTE}, tri AS (
  SELECT e1.s AS na, e1.t AS nb, e2.t AS nc
  FROM e e1
  JOIN e e2 ON e2.s = e1.t
  JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t
), corners AS (
  SELECT unnest([na, nb, nc]) AS user_id FROM tri
)
SELECT user_id, COUNT(*) AS n_triangles
FROM corners
GROUP BY user_id
""",
    tags=("integration", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the co-purchase graph (users
    linked when both bought >$120 items on the same day) — the
    clustering-coefficient / community-density primitive. Two scale
    bounds, both enforced in the plan rather than documented: (1) edge
    GENERATION is capped per day (AKPS_TRI_DAY_CAP, deterministic
    md5-of-id order, mirrored in the oracle) so a hot day cannot
    materialize an unbounded clique; (2) wedge ENUMERATION is
    degree-oriented (edges point toward the higher-degree endpoint,
    wedges form only at the low-degree corner), giving the
    Suri–Vassilvitskii sum(min_deg^2) bound — a hub of degree d emits
    O(sqrt(m)) wedges instead of O(d^2). The oracle counts the same
    capped edge set with the plain 3-way join; orientation is a plan
    property, not a semantic one. Each closed wedge credits all three
    corners via one explode + count. Generalizes the reference's
    same-day payment correlation (kinesis-pay.php:231-263) into a
    relationship-graph metric."""
    tri = _oriented_triangles(_materialized_edges(spark, sf_dir))
    return (
        tri.select(F.explode(F.array("na", "nb", "nc")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "graph_triangle_doulion",
    oracle=f"""
WITH {_TRI_EDGE_CTE}, es AS (
  SELECT s, t FROM e
  WHERE CAST(('0x' || substr(md5(CAST(s AS VARCHAR) || '-' || CAST(t AS VARCHAR)), 1, 4)) AS INTEGER) % 2 = 0
), tri AS (
  SELECT e1.s AS na FROM es e1
  JOIN es e2 ON e2.s = e1.t
  JOIN es e3 ON e3.s = e1.s AND e3.t = e2.t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled_triangles,
       CAST(COUNT(*) * 8 AS BIGINT) AS n_triangles_est
FROM tri
""",
    tags=("integration", "graph"),
)
def graph_triangle_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION global triangle estimate (Tsourakakis et al., KDD'09):
    keep each edge with probability p = 1/2 via a deterministic md5
    coin on the (s,t) pair, count triangles exactly on the sparsified
    graph, scale by 1/p^3 = 8. The coin is applied BEFORE the distinct
    edge set is shuffled onward, so every downstream stage (degree
    count, orientation, wedge join) sees ~p·m edges and ~p^3 of the
    triangles — this is the knob to turn when even the degree-oriented
    exact count is too expensive at 100 TB. The md5 coin makes the
    sample (and hence the estimate) bit-identical across engines, so
    the estimate itself is oracle-checked, not just row-counted."""
    edges = _materialized_edges(spark, sf_dir)
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("s").cast("string"),
                        F.col("t").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    tri = _oriented_triangles(edges.filter(coin))
    return tri.agg(
        F.count(F.lit(1)).alias("n_sampled_triangles"),
        (F.count(F.lit(1)) * F.lit(8)).cast("long").alias("n_triangles_est"),
    )


@register(
    "events_survival_km",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS first_d, CAST(max(ts) AS DATE) AS last_d,
         max(ts) AS last_ts
  FROM events GROUP BY user_id
), horizon AS (SELECT max(ts) AS tmax FROM events),
lab AS (
  SELECT user_id,
    date_diff('day', first_d, last_d) AS life,
    last_ts >= tmax - INTERVAL 7 DAY AS censored
  FROM per_user, horizon
), per_day AS (
  SELECT life AS day,
    SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS deaths,
    COUNT(*) AS ending
  FROM lab GROUP BY life
), risk AS (
  SELECT day, deaths,
    SUM(ending) OVER (ORDER BY day DESC) AS at_risk
  FROM per_day
)
SELECT day, CAST(deaths AS BIGINT) AS deaths,
  CAST(at_risk AS BIGINT) AS at_risk,
  round(CASE WHEN MAX(CASE WHEN deaths = at_risk THEN 1 ELSE 0 END)
                  OVER (ORDER BY day) = 1
        THEN 0.0
        ELSE exp(SUM(CASE WHEN deaths < at_risk
                          THEN ln(1 - CAST(deaths AS DOUBLE) / at_risk) END)
                 OVER (ORDER BY day))
        END, 6) AS survival
FROM risk
ORDER BY day
""",
    tags=("integration", "analytics"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — the churn
    analysis a subscription/payment product (the reference's domain)
    runs on its payment-status stream. A user's lifetime is
    days(first event -> last event); users whose last event falls in
    the final 7 days of the horizon are right-CENSORED (still active:
    they leave the risk set without counting as churn) — the defining
    feature that separates KM from a naive lifetime histogram.

    Plan shape: one shuffle to per-user extents, then everything
    downstream operates on PER-DAY rows whose cardinality is the
    observation horizon in days — bounded by calendar time, NOT by
    users — so the two ordered windows (reverse cumulative risk set,
    cumulative log-survival product) run over at most a few hundred
    rows regardless of user count; at 100 TB the only heavy stage is
    the first groupBy. survival = exp(cumsum(ln(1 - d/n))) with both
    engines summing identically-ordered doubles, rounded 6 dp. The
    d == n day (everyone at risk churns — survival hits exactly 0) is
    guarded explicitly on BOTH engines with a cumulative total-churn
    flag, because neither handles ln(0) usably here: DuckDB RAISES
    (Out of Range) and Spark's log(0) yields NULL that SUM silently
    skips; the flag pins survival to exactly 0.0 from that day on —
    verified against DuckDB on a synthetic everyone-churns corpus in
    tests/test_analytics_props.py."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_d"),
        F.to_date(F.max("ts")).alias("last_d"),
        F.max("ts").alias("last_ts"),
    )
    horizon = ev.agg(F.max("ts").alias("tmax"))
    lab = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").alias("life"),
        (F.col("last_ts") >= F.col("tmax") - F.expr("INTERVAL 7 DAYS")).alias(
            "censored"
        ),
    )
    per_day = lab.groupBy(F.col("life").alias("day")).agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("deaths"),
        F.count(F.lit(1)).alias("ending"),
    )
    # per-DAY frame: horizon-bounded cardinality, so the global ordered
    # windows are safe (same argument as the gapfill/funnel entries)
    w_risk = W.orderBy(F.desc("day")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_surv = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = per_day.withColumn("at_risk", F.sum("ending").over(w_risk))
    all_dead = (
        F.max((F.col("deaths") == F.col("at_risk")).cast("int")).over(w_surv)
        == 1
    )
    log_surv = F.sum(
        F.when(
            F.col("deaths") < F.col("at_risk"),
            F.log(
                F.lit(1.0)
                - F.col("deaths").cast("double") / F.col("at_risk")
            ),
        )
    ).over(w_surv)
    return (
        risk.withColumn(
            "survival",
            F.round(
                F.when(all_dead, F.lit(0.0)).otherwise(F.exp(log_surv)), 6
            ),
        )
        .select(
            # bigint to match DuckDB date_diff (Spark datediff is int —
            # the HUGEINT-class type-audit trap, tests/test_oracle_types.py)
            F.col("day").cast("bigint").alias("day"),
            F.col("deaths").cast("bigint").alias("deaths"),
            F.col("at_risk").cast("bigint").alias("at_risk"),
            "survival",
        )
        .orderBy("day")
    )


@register(
    "events_changepoint_cusum",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), with_mu AS (
  SELECT event_type, day, n,
    CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY event_type) AS mu
  FROM daily
), cusum AS (
  SELECT event_type, day, mu,
    SUM(n - mu) OVER (PARTITION BY event_type ORDER BY day) AS s
  FROM with_mu
), peak AS (
  SELECT event_type, day, mu, s,
    MAX(abs(s)) OVER (PARTITION BY event_type) AS peak_abs
  FROM cusum
)
SELECT event_type, MIN(day) AS change_day,
  round(MAX(peak_abs), 6) AS max_abs_cusum,
  round(MAX(mu), 6) AS mean_daily
FROM peak
WHERE abs(s) = peak_abs
GROUP BY event_type
""",
    tags=("integration", "analytics"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point detection per event type: the day
    where the cumulative sum of (daily count - overall daily mean)
    peaks in magnitude is the classic single-change-point estimate for
    a level shift in a rate series — the drift detector a payment
    platform runs over its event volumes. Earliest day wins ties.

    All windows run on per-(type, day) rows — horizon-bounded, like
    the survival/gapfill entries, so nothing user-scaled crosses one
    task. FP determinism: n is integer, mu is one exact division, and
    the cumulative sum adds identically-ordered doubles on both
    engines; the abs(s) = peak comparison compares two values computed
    through the identical op sequence, so it is safe even in float."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_type = W.partitionBy("event_type")
    with_mu = daily.withColumn(
        "mu",
        F.sum("n").over(w_type).cast("double")
        / F.count(F.lit(1)).over(w_type),
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = with_mu.withColumn(
        "s", F.sum(F.col("n") - F.col("mu")).over(w_cum)
    )
    peak = cusum.withColumn("peak_abs", F.max(F.abs("s")).over(w_type))
    return (
        peak.filter(F.abs("s") == F.col("peak_abs"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("change_day"),
            F.round(F.max("peak_abs"), 6).alias("max_abs_cusum"),
            F.round(F.max("mu"), 6).alias("mean_daily"),
        )
    )


# Out-of-fold target encoding: smoothing mass and fold count (the
# leakage-safe high-cardinality categorical encoder).
_TE_FOLDS = 5
_TE_M = 20.0


@register(
    "fe_target_encoding",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id % {_TE_FOLDS} AS fold,
    CAST(value AS DECIMAL(18,2)) AS v
  FROM events
), per AS (
  SELECT user_id, fold, COUNT(*) AS n_f, SUM(v) AS s_f
  FROM ev GROUP BY user_id, fold
), tot AS (
  SELECT user_id, CAST(SUM(n_f) AS BIGINT) AS n_u, SUM(s_f) AS s_u
  FROM per GROUP BY user_id
), prior AS (
  SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS p FROM ev
)
SELECT per.user_id, CAST(per.fold AS BIGINT) AS fold,
  CAST(per.n_f AS BIGINT) AS n_in_fold,
  tot.n_u - per.n_f AS n_out_of_fold,
  (CAST(tot.s_u - per.s_f AS DOUBLE) + {_TE_M} * prior.p)
    / (tot.n_u - per.n_f + {_TE_M}) AS te
FROM per JOIN tot USING (user_id), prior
""",
    tags=("feature", "agg"),
)
def fe_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe target encoding (the high-cardinality categorical
    encoder behind every tabular GBM/CTR pipeline; Micci-Barreca 2001
    smoothing): encode user_id by the smoothed mean of the target
    (event value) computed OUT-OF-FOLD — each (user, fold) cell's
    encoding excludes that fold's own rows, te = (sum_out + m*prior) /
    (n_out + m), m=20 — so the feature a training row sees never
    contains its own label. Folds are deterministic (event_id % 5).

    Determinism: all sums are exact DECIMAL (the repo's money
    convention) and the out-of-fold numerator is computed by exact
    decimal SUBTRACTION (total minus in-fold) — never a second float
    accumulation — so the one double division happens on bit-identical
    operands in both engines; no rounding step anywhere.

    Scale shape: one groupBy to (user, fold) — the same shuffle a
    plain per-user aggregate needs, ×5 fold cells — one re-aggregation
    of that already-small frame to per-user totals, a 1-row prior
    broadcast, and a broadcast-sized join back. The encoding table
    (users × folds) is what ships to the feature store; the per-row
    training join is a broadcast probe. The subtract-own-fold trick is
    what makes out-of-fold affordable at 100 TB — the naive
    per-fold-recompute is a 5× corpus scan."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_id") % _TE_FOLDS).alias("fold"),
        dec("value", 2).alias("v"),
    )
    per = ev.groupBy("user_id", "fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("v").alias("s_f")
    )
    tot = per.groupBy("user_id").agg(
        F.sum("n_f").cast("bigint").alias("n_u"),
        F.sum("s_f").alias("s_u"),
    )
    prior = ev.agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("p")
    )
    return (
        per.join(tot, "user_id")
        .crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            F.col("fold").cast("bigint").alias("fold"),
            F.col("n_f").cast("bigint").alias("n_in_fold"),
            (F.col("n_u") - F.col("n_f")).alias("n_out_of_fold"),
            (
                (
                    (F.col("s_u") - F.col("s_f")).cast("double")
                    + F.lit(_TE_M) * F.col("p")
                )
                / (F.col("n_u") - F.col("n_f") + F.lit(_TE_M))
            ).alias("te"),
        )
    )


# Seasonal decomposition: centered moving-average window (must be odd)
# and the weekly season the day-of-week means capture.
_STL_W = 7


@register(
    "ts_seasonal_decompose",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), tr AS (
  SELECT event_type, day, n,
    CASE WHEN COUNT(*) OVER w = {_STL_W}
         THEN SUM(n) OVER w END AS sum_w
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_STL_W // 2} PRECEDING
                        AND {_STL_W // 2} FOLLOWING)
), seas AS (
  SELECT event_type, dayofweek(day) AS dow,
    CAST(SUM({_STL_W} * n - sum_w) AS BIGINT) AS num,
    CAST({_STL_W} AS BIGINT) * COUNT(*) AS den
  FROM tr WHERE sum_w IS NOT NULL
  GROUP BY event_type, dayofweek(day)
)
SELECT t.event_type, t.day, CAST(t.n AS BIGINT) AS n,
  CAST(t.sum_w AS DOUBLE) / {_STL_W} AS trend,
  CAST(s.num AS DOUBLE) / s.den AS seasonal,
  t.n - CAST(t.sum_w AS DOUBLE) / {_STL_W}
      - CAST(s.num AS DOUBLE) / s.den AS residual
FROM tr t JOIN seas s
  ON t.event_type = s.event_type AND dayofweek(t.day) = s.dow
WHERE t.sum_w IS NOT NULL
""",
    tags=("timeseries", "window"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily event-count
    series (the moving-average + seasonal-means construction STL
    refines; Cleveland et al. 1990 §2): per event type, trend = exact
    centered 7-day moving average (emitted only where the window is
    full), weekly seasonal = per-day-of-week mean detrended value,
    residual = observed - trend - seasonal. The anomaly/capacity
    primitive: alert on residual, forecast with trend + season.

    Determinism without rounding: the detrended value is kept in
    INTEGER arithmetic scaled by 7 — 7*n - sum_w is an exact BIGINT,
    so the seasonal mean is one exact integer sum divided by (7 ×
    row count), and trend is an exact integer sum divided by 7.0;
    every float op is a division of bit-identical operands. The same
    fixed-point trick as text_classifier_train, without even needing
    a floor.

    Scale shape: the corpus-sized work is ONE aggregation to (type,
    day); every window after that runs on the per-day frame (types ×
    days — thousands of rows at any corpus size), partitioned by
    event_type so there is no single-task global window. At 100 TB
    the daily rollup is the only pass over raw events."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_STL_W // 2), _STL_W // 2)
    )
    tr = daily.select(
        "event_type",
        "day",
        "n",
        F.when(
            F.count(F.lit(1)).over(w) == _STL_W, F.sum("n").over(w)
        ).alias("sum_w"),
    )
    full = tr.filter(F.col("sum_w").isNotNull())
    seas = full.groupBy(
        F.col("event_type").alias("et"), F.dayofweek("day").alias("dow")
    ).agg(
        F.sum(_STL_W * F.col("n") - F.col("sum_w"))
        .cast("bigint")
        .alias("num"),
        (F.lit(_STL_W).cast("bigint") * F.count(F.lit(1))).alias("den"),
    )
    return (
        full.join(
            seas,
            (F.col("event_type") == F.col("et"))
            & (F.dayofweek(F.col("day")) == F.col("dow")),
        )
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n"),
            (F.col("sum_w").cast("double") / _STL_W).alias("trend"),
            (F.col("num").cast("double") / F.col("den")).alias(
                "seasonal"
            ),
            (
                F.col("n")
                - F.col("sum_w").cast("double") / _STL_W
                - F.col("num").cast("double") / F.col("den")
            ).alias("residual"),
        )
    )


# Simple exponential smoothing: alpha, and the fixed-point scale the
# level is carried at (1e6 — counts scale exactly into BIGINT).
_SES_ALPHA = 0.2
_SES_S = 1_000_000


@register(
    "ts_exp_smoothing",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    MAX(day) AS last_day,
    list_transform(list(n ORDER BY day), y -> y * {_SES_S}) AS arr
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, last_day,
  CAST(list_reduce(arr, (acc, x) -> acc
    + CAST(floor({_SES_ALPHA} * (CAST(x AS DOUBLE) - CAST(acc AS DOUBLE))
                 + 0.5) AS BIGINT)) AS DOUBLE) / {_SES_S} AS ses_forecast
FROM series
""",
    tags=("timeseries", "agg"),
)
def ts_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing over the daily event-count series
    (Brown 1956; the one-parameter forecaster under every ops
    dashboard): level' = level + alpha*(y - level), seeded with the
    first observation, final level = the one-step-ahead forecast per
    event type.

    The interesting part is HOW a sequential per-series recurrence
    runs in a distributed engine without a Python worker: the series
    aggregates to (type, day) counts — the only corpus-sized work —
    each type's ordered day array folds JVM-side in ONE codegen'd
    F.aggregate expression, and the oracle replays the identical fold
    with DuckDB's list_reduce (which seeds with the first element;
    the Spark side seeds its explicit zero with element 1 and folds
    the slice from 2 — the same ladder). State is series-length-
    bounded (the time horizon), not corpus-bounded, so the collected
    array stays small at any data size.

    Determinism: the level is a fixed-point BIGINT (scale 1e6) and
    each update quantizes through the explicit floor(v + 0.5) IEEE
    chain — the text_classifier_train discipline — so both engines
    walk bit-identical level trajectories; the only float ops divide
    or subtract bit-identical operands."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("day").alias("last_day"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"] * _SES_S,
        ).alias("arr"),
    )
    level = F.aggregate(
        F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0))),
        F.element_at(F.col("arr"), 1),
        lambda acc, x: acc
        + F.floor(
            F.lit(_SES_ALPHA) * (x.cast("double") - acc.cast("double"))
            + F.lit(0.5)
        ).cast("long"),
    )
    return series.select(
        "event_type",
        "n_days",
        "last_day",
        (level.cast("double") / _SES_S).alias("ses_forecast"),
    )


@register(
    "ts_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(n) AS BIGINT) AS s
  FROM daily GROUP BY event_type
), dev AS (
  SELECT d.event_type, d.day, st.m, (st.m * d.n - st.s) AS dv
  FROM daily d JOIN stats st ON st.event_type = d.event_type
), led AS (
  SELECT event_type, m, dv,
    LEAD(dv, 1) OVER w AS dv1,
    LEAD(dv, 2) OVER w AS dv2,
    LEAD(dv, 3) OVER w AS dv3
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)
), agg AS (
  SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_days,
    CAST(SUM(dv * dv) AS BIGINT) AS den,
    CAST(SUM(dv * dv1) AS BIGINT) AS num1,
    CAST(SUM(dv * dv2) AS BIGINT) AS num2,
    CAST(SUM(dv * dv3) AS BIGINT) AS num3
  FROM led GROUP BY event_type
)
SELECT event_type, CAST(lag AS INT) AS lag, n_days,
  CAST(num AS DOUBLE) / den AS acf
FROM (
  SELECT event_type, n_days, den, 1 AS lag, num1 AS num FROM agg
  UNION ALL
  SELECT event_type, n_days, den, 2, num2 FROM agg
  UNION ALL
  SELECT event_type, n_days, den, 3, num3 FROM agg
)
WHERE den <> 0
""",
    tags=("timeseries", "window"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of each event type's daily-count
    series at lags 1-3 — the seasonality/momentum detector behind
    every forecasting pipeline (a weekly cycle shows as an acf spike
    at lag 7; near-1 lag-1 acf says "use yesterday as the forecast").

    Determinism by INTEGER arithmetic, no rounding anywhere: with m
    days and total S, the deviation is scaled to m*n_t - S (exact
    BIGINT; the m^2 scale factor cancels in the ratio), so numerator
    and denominator are exact integer sums and the single final
    division is bit-stable across engines — the ts_seasonal_decompose
    convention extended to second-order statistics.

    Plan shape: one hash aggregation to daily counts (map-side
    combined), a broadcast of the per-type (m, S) stats, ONE window
    pass producing all three leads, one aggregation to (type, den,
    num1..3), then a 3-way stack of a types-sized frame. Series state
    is days x types — invariant to event-row growth, the same 100 TB
    argument as agg_time_rollup."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "m",
        (F.col("m") * F.col("n") - F.col("s")).alias("dv"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    led = dev.select(
        "event_type",
        "m",
        "dv",
        F.lead("dv", 1).over(w).alias("dv1"),
        F.lead("dv", 2).over(w).alias("dv2"),
        F.lead("dv", 3).over(w).alias("dv3"),
    )
    agg = led.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_days"),
        F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("den"),
        F.sum(F.col("dv") * F.col("dv1")).cast("bigint").alias("num1"),
        F.sum(F.col("dv") * F.col("dv2")).cast("bigint").alias("num2"),
        F.sum(F.col("dv") * F.col("dv3")).cast("bigint").alias("num3"),
    )
    stacked = agg.select(
        "event_type",
        "n_days",
        "den",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("lag"), F.col("num1").alias("num")),
                F.struct(F.lit(2).alias("lag"), F.col("num2").alias("num")),
                F.struct(F.lit(3).alias("lag"), F.col("num3").alias("num")),
            )
        ).alias("p"),
    )
    return stacked.filter(F.col("den") != 0).select(
        "event_type",
        F.col("p.lag").cast("int").alias("lag"),
        "n_days",
        (F.col("p.num").cast("double") / F.col("den")).alias("acf"),
    )


_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    """Synchronous label propagation unrolled to _LPA_ROUNDS rounds of
    CTEs over the shared co-purchase edge set — fixed rounds and the
    (count DESC, label) tie-break make community assignment exactly
    reproducible, so a graph community algorithm gets a real SQL
    oracle (cf. graph_cc's recursive-CTE closure)."""
    rounds = []
    prev = "labels0"
    for r in range(1, _LPA_ROUNDS + 1):
        rounds.append(f""", votes{r} AS (
  SELECT e.src AS node, l.lbl, COUNT(*) AS c
  FROM edges e JOIN {prev} l ON l.node = e.dst
  GROUP BY e.src, l.lbl
), best{r} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM votes{r}) v
  WHERE rn = 1
), labels{r} AS (
  SELECT p.node, COALESCE(b.lbl, p.lbl) AS lbl
  FROM {prev} p LEFT JOIN best{r} b ON b.node = p.node
)""")
        prev = f"labels{r}"
    return (
        "WITH edges AS ("
        + _CC_EDGES_SQL
        + """
), labels0 AS (
  SELECT DISTINCT src AS node, src AS lbl FROM edges
)"""
        + "".join(rounds)
        + f"""
SELECT node AS user_id, lbl AS community FROM labels{_LPA_ROUNDS}
"""
    )


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("integration", "graph", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the shared co-purchase graph: every node starts
    as its own community, and each round adopts the MODE of its
    neighbors' labels (ties broken toward the smaller label —
    determinism where vanilla LPA is famously run-order dependent).
    Three fixed synchronous rounds, so the full algorithm — votes,
    argmax, carry-forward for isolated nodes — unrolls into an exact
    SQL oracle, which no asynchronous LPA can offer. Complements the
    components family: CC answers "who is connected at all",
    LPA's denser-than-surroundings communities answer "who clusters".

    Scale shape: each round is one shuffle of (edge endpoint, label)
    pairs into a (node, label) count + one aggregate argmax on the
    candidate frame — all O(edges) with map-side combines, labels
    never wider than a bigint. Fixed round count (not convergence
    polling) keeps the DAG static; at 100 TB rounds are the budget
    knob exactly as in graph_cc_pointer_doubling, and the same
    _CC_DAY_CAP bounds the edge build.

    r12 OPT (the pointer-doubling treatment, guide §2.4/§3.1): the
    labels frame is day-cap-bounded (a few MB at any corpus size), so
    the per-round vote join BROADCASTS it — the O(edges) frame is
    never shuffled; the per-node argmax is max_by over (count,
    -label) — identical to the row_number()=1 pick (ties toward the
    smaller label; (c, -lbl) is unique per (node,lbl)) without the
    window's extra exchange; and the old carry-forward left join is
    gone because it was vestigial: every node is a src of the
    symmetric edge set, so every node receives votes every round and
    the coalesce('new_lbl', 'lbl') never fired. Two partial-aggregated
    shuffles remain per round: (node,label) vote counts and the
    per-node argmax rollup."""
    edges = _cc_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _r in range(_LPA_ROUNDS):
        votes = (
            edges.join(
                F.broadcast(
                    labels.select(F.col("node").alias("dst"), "lbl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
                ).alias("lbl")
            )
            .localCheckpoint()
        )
    return labels.select(
        F.col("node").alias("user_id"), F.col("lbl").alias("community")
    )


@register(
    "fe_woe_iv",
    oracle="""
WITH t AS (
  SELECT c.c_mktsegment,
    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT c_mktsegment,
    CAST(SUM(y) AS BIGINT) AS n_goods,
    CAST(SUM(1 - y) AS BIGINT) AS n_bads
  FROM t GROUP BY c_mktsegment
), tot AS (
  SELECT CAST(SUM(n_goods) AS DOUBLE) AS tg,
    CAST(SUM(n_bads) AS DOUBLE) AS tb
  FROM g
), terms AS (
  SELECT c_mktsegment, n_goods, n_bads,
    round(ln((n_goods / tg) / (n_bads / tb)), 6) AS woe,
    CAST(round((n_goods / tg - n_bads / tb)
               * ln((n_goods / tg) / (n_bads / tb)), 6)
         AS DECIMAL(18,6)) AS iv_term
  FROM g CROSS JOIN tot
  WHERE n_goods > 0 AND n_bads > 0
)
SELECT c_mktsegment, n_goods, n_bads, woe,
  CAST(iv_term AS DOUBLE) AS iv_term,
  (SELECT CAST(SUM(iv_term) AS DOUBLE) FROM terms) AS iv_total
FROM terms
""",
    tags=("feature", "agg", "stats"),
)
def fe_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence / Information Value — the credit-scoring
    categorical encoder and feature-screening statistic (Siddiqi's
    scorecard method; IV < 0.02 useless, > 0.3 strong): per market
    segment, woe = ln(share-of-goods / share-of-bads) for the binary
    target "order is high priority", iv = sum over segments of
    (good_share - bad_share) * woe. Unlike fe_target_encoding (mean
    target with folds), WoE is the log-odds encoder — monotone in the
    event rate and additive in a logistic model, which is why the
    scorecard world standardized on it.

    Determinism: counts are exact BIGINTs, shares are single IEEE
    divisions, and each ln-term rounds to 6 dp before accumulating in
    DECIMAL (text_bigram_nll convention). Plan: fact-dim join (orders
    joins broadcast customer at this SF; co-partitioned at 100 TB) ->
    one hash agg to the 5-row segment frame -> arithmetic + 1-row
    broadcasts. The statistic frame is domain-sized, so scale lands
    in the map-side partials."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = t.groupBy("c_mktsegment").agg(
        F.sum("y").cast("bigint").alias("n_goods"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_bads"),
    )
    tot = g.agg(
        F.sum("n_goods").cast("double").alias("tg"),
        F.sum("n_bads").cast("double").alias("tb"),
    )
    gs = F.col("n_goods") / F.col("tg")
    bs = F.col("n_bads") / F.col("tb")
    # a pure segment (zero goods or zero bads) makes WOE ln(0)/ln(inf):
    # DuckDB throws, ANSI Spark divides by zero — the standard
    # credit-scoring treatment is to exclude (or merge) such bins;
    # exclude identically on both engines
    terms = g.filter(
        (F.col("n_goods") > 0) & (F.col("n_bads") > 0)
    ).crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "n_goods",
        "n_bads",
        F.round(F.log(gs / bs), 6).alias("woe"),
        F.round((gs - bs) * F.log(gs / bs), 6)
        .cast("decimal(18,6)")
        .alias("iv_term"),
    )
    total = terms.agg(F.sum("iv_term").cast("double").alias("iv_total"))
    return terms.crossJoin(F.broadcast(total)).select(
        "c_mktsegment",
        "n_goods",
        "n_bads",
        "woe",
        F.col("iv_term").cast("double").alias("iv_term"),
        "iv_total",
    )


_QBIN_K = 8  # equi-depth bucket count


@register(
    "fe_quantile_binning",
    oracle=f"""
WITH dv AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL
  GROUP BY value
), pre AS (
  SELECT value, cnt,
    COALESCE(SUM(cnt) OVER (
      ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cum_before,
    SUM(cnt) OVER () AS n
  FROM dv
), binned AS (
  SELECT value,
    CAST(LEAST({_QBIN_K - 1}, ({_QBIN_K} * cum_before) // n)
         AS BIGINT) AS bin
  FROM pre
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
  round(MIN(e.value), 6) AS lo, round(MAX(e.value), 6) AS hi
FROM events e JOIN binned b ON e.value = b.value
GROUP BY bin
""",
    tags=("feature", "agg", "scale-pattern"),
)
def fe_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) feature binning — the discretizer behind
    WoE scorecards, decision-tree histograms, and monotonic-feature
    buckets: assign each value to one of K=8 buckets holding ~equal
    row counts. bin(v) = floor(K * rank_before(v) / n), all BIGINT
    arithmetic (integer floor division in both engines — a double
    division could round across the bucket edge).

    vs agg_histogram_equidepth: that one assigns rows against
    INTERPOLATED quartile value boundaries (two-pass histogram,
    sketch-swappable); this one is RANK-exact — bucket edges are row
    counts, not values, so bins are equal-depth to the tie run even
    where the value distribution is lumpy (what a WoE scorecard or
    tree-histogram discretizer actually needs).

    THE SCALE PATTERN (same class as agg_mann_whitney): the prefix
    window runs over the DISTINCT-VALUE frame — value is 2-dp money,
    a saturating domain (13k distinct under 40k rows at sf0.1; still
    the price domain at 10M rows) — never over raw rows; rows then
    broadcast-join to their bucket by value. Output is the per-bin
    profile (count + [lo, hi]), which also PROVES equi-depth: bins
    differ by at most one distinct-value run. Allowlisted in
    test_plan_sweep with the distinct-value-frame proof."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dv = ev.groupBy("value").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_pre = W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("value").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    pre = dv.select(
        "value",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    binned = pre.select(
        "value",
        F.least(
            F.lit(_QBIN_K - 1),
            F.expr(f"({_QBIN_K} * cum_before) div n"),
        ).alias("bin"),
    )
    return (
        ev.join(F.broadcast(binned), "value")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@register(
    "ts_changepoint_binseg",
    oracle="""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
    SUM(CAST(value AS DECIMAL(18,2))) AS s,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY day
), x AS (
  SELECT day,
    CAST(round(CAST(s AS DOUBLE) / c, 6) AS DECIMAL(18,6)) AS x,
    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
    CAST(COUNT(*) OVER () AS BIGINT) AS tt
  FROM d
), pre AS (
  SELECT day, t, tt,
    SUM(x) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(x) OVER () AS total
  FROM x
), cand AS (
  SELECT day, t,
    round(CAST(t AS DOUBLE) * (tt - t) / tt
          * (CAST(cum AS DOUBLE) / t
             - (CAST(total AS DOUBLE) - CAST(cum AS DOUBLE)) / (tt - t))
          * (CAST(cum AS DOUBLE) / t
             - (CAST(total AS DOUBLE) - CAST(cum AS DOUBLE)) / (tt - t)),
          6) AS gain,
    round(CAST(cum AS DOUBLE) / t, 6) AS mean_left,
    round((CAST(total AS DOUBLE) - CAST(cum AS DOUBLE)) / (tt - t), 6)
      AS mean_right
  FROM pre WHERE t < tt
)
SELECT day, t, gain, mean_left, mean_right,
  ROW_NUMBER() OVER (ORDER BY gain DESC, t) = 1 AS is_changepoint
FROM cand
""",
    tags=("timeseries", "stats"),
)
def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection — the first split of binary
    segmentation (the classic Scott-Knott / CUSUM-equivalent form):
    for every candidate split t of the daily-mean series, the
    variance-reduction gain k(T-k)/T * (mean_L - mean_R)^2; the argmax
    day is the changepoint. This is the monitoring primitive behind
    "did the metric shift and WHEN" — one step up from dq_psi_drift's
    fixed-half comparison, and the MEAN-LEVEL complement of
    events_changepoint_cusum (which peaks the cumulative deviation of
    per-type COUNTS; binseg reports the split statistic itself plus
    the before/after means, which is what the alerting payload needs).

    Determinism: daily means round to 6 dp and prefix-accumulate in
    DECIMAL (order-free), so left/right means derive from exact
    sums; gain rounds to 6 dp with the day as tie-break. Plan: one
    hash agg to the CALENDAR frame (30 rows), then rank/prefix
    windows over that frame only — row growth lands in the map-side
    partials (allowlisted: per-day domain)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    x = d.select(
        "day",
        F.round(F.col("s").cast("double") / F.col("c"), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.row_number().over(W.orderBy("day")).cast("bigint").alias("t"),
        F.count(F.lit(1))
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint")
        .alias("tt"),
    )
    pre = x.select(
        "day",
        "t",
        "tt",
        F.sum("x")
        .over(W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("x")
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("total"),
    )
    mean_l = F.col("cum").cast("double") / F.col("t")
    mean_r = (F.col("total").cast("double") - F.col("cum").cast("double")) / (
        F.col("tt") - F.col("t")
    )
    diff = mean_l - mean_r
    cand = pre.filter(F.col("t") < F.col("tt")).select(
        "day",
        "t",
        F.round(
            F.col("t").cast("double")
            * (F.col("tt") - F.col("t"))
            / F.col("tt")
            * diff
            * diff,
            6,
        ).alias("gain"),
        F.round(mean_l, 6).alias("mean_left"),
        F.round(mean_r, 6).alias("mean_right"),
    )
    return cand.select(
        "day",
        "t",
        "gain",
        "mean_left",
        "mean_right",
        (
            F.row_number().over(W.orderBy(F.col("gain").desc(), F.col("t")))
            == 1
        ).alias("is_changepoint"),
    )


_BIPROJ_CAP = 64  # max items per customer entering the pair stage
_BIPROJ_TOPK = 20


@register(
    "graph_bipartite_projection",
    oracle=f"""
WITH ci AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), capped AS (
  SELECT cust, item FROM (
    SELECT cust, item,
      ROW_NUMBER() OVER (PARTITION BY cust
        ORDER BY md5(CAST(item AS VARCHAR)), item) AS rn
    FROM ci) t WHERE rn <= {_BIPROJ_CAP}
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b
  FROM capped a JOIN capped b ON a.cust = b.cust AND a.item < b.item
)
SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_common
FROM pairs GROUP BY item_a, item_b
ORDER BY n_common DESC, item_a, item_b LIMIT {_BIPROJ_TOPK}
""",
    tags=("agg", "graph", "llm"),
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection — the co-occurrence preprocessing of every
    item-item recommender and co-citation graph: project the
    customer-part purchase graph onto parts, weighting each part pair
    by the number of customers buying both; return the top-20 pairs.

    THE quadratic-candidate discipline (dedup.py BAND_CAP class):
    pair fan-out per customer is C(degree, 2), so degree is capped at
    64 (_BIPROJ_CAP) in md5(item) order — deterministic, mirrored
    VERBATIM in the oracle, and identity at the driver SFs (typical
    basket size is far below the cap); at 100 TB the cap is what
    keeps a crawler/power-buyer from emitting billions of pairs (the
    same reason GraphFrames' motif joins cap supernodes). Plan:
    distinct edge agg -> partitioned cap window -> self-join on the
    customer key -> pair hash agg -> TakeOrderedAndProject (top-k via
    orderBy().limit(), never a global row_number). The capped edge
    frame is a session_artifact memo (VERDICT r11 #5, the
    _materialized_edges convention): the distinct-edge agg + cap
    window were rebuilt per call even though the frame is a pure
    function of the input tables — at 100 TB a capped adjacency IS a
    maintained table, probed by every projection/recommender pass."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    def build_capped() -> DataFrame:
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        ci = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(
                F.col("o_custkey").alias("cust"),
                F.col("l_partkey").alias("item"),
            )
            .distinct()
        )
        rn_w = W.partitionBy("cust").orderBy(
            F.md5(F.col("item").cast("string")), F.col("item")
        )
        return (
            ci.withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") <= _BIPROJ_CAP)
            .select("cust", "item")
        )

    capped = session_artifact(
        spark, f"akps_biproj_capped_{sf_tag(sf_dir)}", build_capped
    ).repartition(32, "cust")
    # pinned spread (SCALE.md AQE blind spot): the capped edge frame
    # is byte-small but every row fans out to ~degree join partners —
    # AQE's byte-based coalescing would serialize the pair stage;
    # explicit numPartitions, same key as the join
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cust") == F.col("b.cust"))
        & (F.col("a.item") < F.col("b.item")),
    ).select(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        .orderBy(F.col("n_common").desc(), "item_a", "item_b")
        .limit(_BIPROJ_TOPK)
    )


@register(
    "events_rolling_active_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
  FROM events
), days AS (
  SELECT DISTINCT d FROM du
), fanned AS (
  SELECT DISTINCT du.user_id, days.d AS end_day
  FROM du JOIN days
    ON days.d >= du.d AND days.d <= du.d + INTERVAL 6 DAY
), wau AS (
  SELECT end_day, CAST(COUNT(*) AS BIGINT) AS wau
  FROM fanned GROUP BY end_day
), dau AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d
)
SELECT dau.d, dau.dau, wau.wau,
  round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON wau.end_day = dau.d
WHERE dau.d >= (SELECT MIN(d) FROM days) + INTERVAL 6 DAY
""",
    tags=("integration", "analytics"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active users — per day, the DISTINCT users seen in the
    trailing 7 days (WAU) next to that day's DAU and the DAU/WAU
    stickiness ratio. Distinct-over-a-sliding-window is the classic
    "you cannot pre-aggregate it" trap: daily distinct counts do NOT
    sum into a weekly distinct. The scale-correct shape used here is
    BOUNDED FAN-OUT: reduce once to the (day, user) distinct frame,
    fan each membership to the ≤7 window-end days it supports
    (sequence + explode — a constant 7× multiplier, NOT a self-join of
    facts), then distinct + count per end day. Two hash aggregations
    and one bounded explode; no window function, no O(days²) join.

    At 100 TB: the (day, user) frame is the only thing that scales
    with data (its distinct is map-side combined on the date-bucketed
    scan); the 7× fan multiplies the REDUCED frame, not the fact
    table — for a 28-day MAU the multiplier is 28, still constant.
    The WHERE trims the warm-up days whose trailing window is not yet
    fully observed, so every reported WAU covers a complete 7-day
    span. Counts are exact BIGINTs; stickiness rounds to 6 dp."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    fanned = du.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("interval 1 day")
            )
        ).alias("end_day"),
    ).distinct()
    days = du.select("d").distinct()
    # only end-days that actually occur, with a full trailing week
    min_day = days.agg(F.min("d").alias("min_d"))
    wau = (
        fanned.join(days.withColumnRenamed("d", "end_day"), "end_day")
        .groupBy("end_day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )
    dau = du.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    out = dau.join(wau, dau.d == wau.end_day).join(
        F.broadcast(min_day),
        F.col("d") >= F.date_add(F.col("min_d"), 6),
    )
    return out.select(
        "d",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


_KCORE_K = 4  # core order: survivors need >= K surviving neighbors
_KCORE_W = 6  # edge weight floor: co-purchase on >= W distinct days
_KCORE_ROUNDS = 8  # peel-round budget (fixture converges in <= 4)
# tighter than _CC_DAY_CAP: the weighted build generates cap^2 pair
# instances per day BEFORE the strength threshold prunes them, so the
# cap is the pair-generation budget, not just a skew bound
_KCORE_DAY_CAP = 128

_KCORE_ORACLE = f"""
WITH du AS (
  SELECT d, user_id FROM (
    SELECT d, user_id,
      ROW_NUMBER() OVER (PARTITION BY d
        ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
    FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
          FROM events WHERE event_type = 'purchase') x) c
  WHERE rn <= {_KCORE_DAY_CAP}
), kedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
    FROM du a JOIN du b USING (d)
    WHERE a.user_id <> b.user_id
    GROUP BY a.user_id, b.user_id) t
  WHERE w >= {_KCORE_W}
), a0 AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM kedges
),
a1 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a0 s ON e.src = s.node
  JOIN a0 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a2 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a1 s ON e.src = s.node
  JOIN a1 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a3 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a2 s ON e.src = s.node
  JOIN a2 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a4 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a3 s ON e.src = s.node
  JOIN a3 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a5 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a4 s ON e.src = s.node
  JOIN a4 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a6 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a5 s ON e.src = s.node
  JOIN a5 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a7 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a6 s ON e.src = s.node
  JOIN a6 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
),
a8 AS MATERIALIZED (
  SELECT e.src AS node FROM kedges e
  JOIN a7 s ON e.src = s.node
  JOIN a7 t ON e.dst = t.node
  GROUP BY e.src HAVING COUNT(*) >= {_KCORE_K}
)
SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM kedges e
JOIN a{_KCORE_ROUNDS} s ON e.src = s.node
JOIN a{_KCORE_ROUNDS} t ON e.dst = t.node
GROUP BY e.src
"""


@register(
    "graph_kcore",
    oracle=_KCORE_ORACLE,
    tags=("integration", "graph", "iterative"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition by iterative peeling (Matula & Beck 1983;
    the standard cohesion filter before community detection — Batagelj
    & Zaversnik's O(E) sequential algorithm becomes "peel all
    under-degree nodes per round" in the distributed setting): repeat
    {{drop every node with fewer than K surviving neighbors}} until a
    fixpoint — what remains is the maximal subgraph of minimum degree
    K, with each survivor's in-core degree reported. The graph is the
    co-purchase graph STRENGTH-THRESHOLDED (edge iff two users
    co-purchased on >= {_KCORE_W} distinct days, day-capped at
    {_KCORE_DAY_CAP} users like every co-occurrence build here) so degree
    actually varies — peeling on an unweighted day-clique graph is
    vacuous.

    Convergence contract: both engines compute exactly
    {_KCORE_ROUNDS} peel rounds; peeling is MONOTONE (alive sets only
    shrink) and idempotent at the fixpoint, so early-exit-on-fixpoint
    (Spark) and blind unrolling (the oracle CTE chain) provably agree
    whenever convergence happens within the budget — pinned at <= 4
    rounds on the fixture in tests. Per round: two hash joins of the
    edge list against the alive frame + one count aggregation, with
    localCheckpoint cutting lineage — O(rounds x E) total, the alive
    frame O(nodes). At 100 TB: the edge build is one distinct scan +
    a capped day self-join + a pair-count aggregation; rounds are
    data-independent joins that AQE sizes, and the round budget
    bounds wall-clock regardless of graph shape (a real deployment
    raises it with diameter, same contract)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    day_users = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id")
        .distinct()
    )
    w_day = W.partitionBy("d").orderBy(
        F.md5(F.col("user_id").cast("string")), "user_id"
    )
    capped = (
        day_users.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= _KCORE_DAY_CAP)
        .drop("rn")
    )
    a = capped.select("d", F.col("user_id").alias("src"))
    b = capped.select("d", F.col("user_id").alias("dst"))
    edges = (
        a.join(b, "d")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _KCORE_W)
        .select("src", "dst")
        # localCheckpoint, not persist/unpersist: the returned frame is
        # evaluated AFTER this function exits, so a finally-unpersist
        # would recompute the whole capped self-join edge build for the
        # final core-degree aggregation (ADVICE r8). Eager checkpoint
        # materializes the O(edges) frame once for loop AND result.
        .localCheckpoint()
    )
    alive = edges.select(F.col("src").alias("node")).distinct()
    alive = alive.localCheckpoint()
    n_alive = alive.count()
    for _ in range(_KCORE_ROUNDS):
        surv = (
            edges.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        n_surv = surv.count()
        alive = surv
        if n_surv == n_alive:
            break  # monotone fixpoint: further rounds are no-ops
        n_alive = n_surv
    return (
        edges.join(alive.withColumnRenamed("node", "src"), "src")
        .join(alive.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


@register(
    "fe_lag_features",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    SUM(CAST(round(value, 3) AS DECIMAL(18,3))) AS day_value_dec
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
), feats AS (
  SELECT user_id, d, n_events,
    CAST(day_value_dec AS DOUBLE) AS day_value,
    LAG(n_events, 1) OVER w AS lag1_events,
    LAG(n_events, 7) OVER w AS lag7_events,
    round(CAST(SUM(day_value_dec) OVER
        (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      / (COUNT(*) OVER
        (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), 6) AS roll7_value,
    CAST(COUNT(*) OVER
      (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7_n,
    LEAD(n_events, 1) OVER w AS target_next_events
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY d)
)
SELECT * FROM feats WHERE target_next_events IS NOT NULL
""",
    tags=("integration", "features"),
)
def fe_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/rolling FEATURE MATRIX for per-user forecasting — the
    feature-engineering pass every churn/forecast model runs before
    training: per (user, day) activity reduced first, then lag-1 /
    lag-7 counts, a trailing 7-row rolling mean of daily value, and
    the LEAKAGE-FREE next-day target (LEAD 1 — strictly future, the
    same discipline as win_lead_label; rows without an observed next
    day are dropped, not zero-filled, so the label never fabricates
    churn). Gaps in a user's calendar make LAG/LEAD ROW-offset
    semantics deliberate here: features mean "previous active day",
    which is the standard activity-history encoding (the
    calendar-exact alternative is agg_period_over_period's offset
    self-join).

    Plan shape: ONE hash aggregation events -> (user, day) — the only
    stage that sees raw rows — then a single window shuffle
    partitioned by user_id (high cardinality, bounded ~30-row
    partitions: the day domain), producing all five features in one
    pass over that reduced frame. At 100 TB this is one shuffle on the
    natural key and embarrassingly parallel across users. Float
    discipline: day_value stays 3-dp DECIMAL through the frame SUM
    (exact, summation-order-independent — same rule as
    win_rolling_regression: DuckDB's segment-tree window summation
    order differs from Spark's sequential frame scan, so a DOUBLE
    frame AVG can drift 1 ulp and flip a 6-dp digit), casting to
    DOUBLE only for the single division by roll7_n."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round("value", 3).cast("decimal(18,3)")).alias(
            "day_value_dec"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("d")
    w7 = w.rowsBetween(-6, 0)
    feats = daily.select(
        "user_id",
        "d",
        "n_events",
        F.col("day_value_dec").cast("double").alias("day_value"),
        F.lag("n_events", 1).over(w).alias("lag1_events"),
        F.lag("n_events", 7).over(w).alias("lag7_events"),
        F.round(
            F.sum("day_value_dec").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7),
            6,
        ).alias("roll7_value"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("roll7_n"),
        F.lead("n_events", 1).over(w).alias("target_next_events"),
    )
    return feats.filter(F.col("target_next_events").isNotNull())


_HOLT_S = 1000000  # fixed-point scale for the (level, trend) state


@register(
    "ts_holt_linear",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), indexed AS (
  SELECT event_type, day, n,
    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      AS BIGINT) AS i
  FROM daily
), meta AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
    MAX(day) AS last_day
  FROM indexed GROUP BY event_type
), steps AS (
  SELECT event_type, i, CAST(n * {_HOLT_S} AS BIGINT) AS l,
    CAST(0 AS BIGINT) AS b
  FROM indexed WHERE i = 1
  UNION ALL
  SELECT s.event_type, s.i + 1,
    __LP__,
    CAST(((__LP__ - s.l) + 9*s.b + 5
      - ((((__LP__ - s.l) + 9*s.b + 5) % 10 + 10) % 10)) / 10 AS BIGINT)
  FROM steps s
  JOIN indexed d ON d.event_type = s.event_type AND d.i = s.i + 1
), final AS (
  SELECT st.event_type, st.l, st.b
  FROM steps st JOIN meta m
    ON st.event_type = m.event_type AND st.i = m.n_days
)
SELECT f.event_type, m.n_days, m.last_day,
  round(CAST(f.l AS DOUBLE) / {_HOLT_S}, 6) AS level,
  round(CAST(f.b AS DOUBLE) / {_HOLT_S}, 6) AS trend,
  round(CAST(f.l + 7 * f.b AS DOUBLE) / {_HOLT_S}, 6) AS forecast_7d
FROM final f JOIN meta m ON f.event_type = m.event_type
""".replace("__LP__", f"CAST((3*d.n*{_HOLT_S} + 7*(s.l+s.b) + 5 - (((3*d.n*{_HOLT_S} + 7*(s.l+s.b) + 5) % 10 + 10) % 10)) / 10 AS BIGINT)"),
    tags=("timeseries", "agg"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (Holt 1957 — the two-parameter
    forecaster: level AND trend state, alpha = 0.3, beta = 0.1) over
    the daily event-count series, extending ts_exp_smoothing's
    one-parameter fold to a STRUCT accumulator: each series aggregates
    to its ordered day array once, then the (level, trend) recurrence
    folds JVM-side in one codegen'd F.aggregate expression — no Python
    worker, no per-step Spark job, state bounded by the time horizon.
    The 7-day-ahead forecast is level + 7·trend.

    Determinism: the ENTIRE recurrence is integer arithmetic — state
    is fixed-point BIGINT (scale 1e6), the alpha/beta blends are
    integer numerators (3/10, 1/10) and each step divides by 10 via
    the explicit pmod floor-division chain, so no float enters the
    fold at all and both engines walk bit-identical (level, trend)
    trajectories; DuckDB replays the identical fold with list_reduce
    (whose seed IS the first element — exactly the l=y1, b=0 seed,
    since elements carry b=0). Numerators stay < 2^40, far inside
    BIGINT. Scale shape identical to ts_exp_smoothing: one hash agg
    is the only corpus-sized stage."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("day").alias("last_day"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: F.struct(
                (s["n"] * _HOLT_S).cast("long").alias("l"),
                F.lit(0).cast("long").alias("b"),
            ),
        ).alias("arr"),
    )

    def _div10(a):
        return ((a - F.pmod(a, 10)) / 10).cast("long")

    def step(acc, x):
        l_new = _div10(3 * x["l"] + 7 * (acc["l"] + acc["b"]) + 5)
        b_new = _div10((l_new - acc["l"]) + 9 * acc["b"] + 5)
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = F.aggregate(
        F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0))),
        F.element_at(F.col("arr"), 1),
        step,
    )
    return series.select(
        "event_type",
        "n_days",
        "last_day",
        F.round(st["l"].cast("double") / _HOLT_S, 6).alias("level"),
        F.round(st["b"].cast("double") / _HOLT_S, 6).alias("trend"),
        F.round(
            (st["l"] + 7 * st["b"]).cast("double") / _HOLT_S, 6
        ).alias("forecast_7d"),
    )


@register(
    "events_bot_detection",
    oracle="""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    -- order by TRUNCATED micros (+ id), not raw ts: DuckDB sees nanos
    -- where Spark sees micros, and a sub-microsecond tie must break
    -- identically on both engines
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev_t
  FROM events
), gaps AS (
  SELECT user_id, t - prev_t AS gap FROM seq WHERE prev_t IS NOT NULL
), stats AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n_gaps,
    CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
      AS DOUBLE) AS s2
  FROM gaps GROUP BY user_id HAVING COUNT(*) >= 5
)
SELECT user_id, n_gaps,
  round(s1 / n_gaps / 1000000, 6) AS mean_gap_s,
  round(sqrt(GREATEST((s2 - s1 * s1 / n_gaps) / (n_gaps - 1), 0.0))
        / 1000000, 6) AS sd_gap_s,
  round(sqrt(GREATEST((s2 - s1 * s1 / n_gaps) / (n_gaps - 1), 0.0))
        / (s1 / n_gaps), 6) AS cv,
  sqrt(GREATEST((s2 - s1 * s1 / n_gaps) / (n_gaps - 1), 0.0))
    / (s1 / n_gaps) < 0.5 AS is_regular
FROM stats WHERE s1 > 0
""",
    tags=("integration", "anomaly"),
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot / scripted-client detection by inter-event-time REGULARITY:
    human activity is bursty (coefficient of variation of gaps ~ 1 for
    Poisson-like arrivals, higher with sessions), schedulers and
    scripts are metronomic (cv << 1) — so each user's gap series
    reduces to mean, standard deviation and cv, flagging cv < 0.5.
    The behavioral cousin of events_anomaly_rate_spike (volume) and
    win_out_of_order_profile (lateness); the reference's poll-cadence
    concern (is something hammering /status on a timer?,
    kinesis-pay.php:263,302-304) asked per CLIENT.

    Plan shape: one window shuffle on user_id (the LAG that produces
    gaps — high-cardinality partitions, per-user event counts), then
    one hash aggregation to per-user sufficient statistics; users with
    fewer than 5 gaps are excluded (cv is meaningless at tiny n).
    Float discipline: gaps are exact BIGINT microseconds; their sums
    and sums-of-squares accumulate in DECIMAL(38,0) (exact,
    order-independent — gap² reaches ~1e24, far inside 38 digits),
    casting to DOUBLE only for the per-user mean/sd/cv arithmetic,
    identical expression trees both engines, rounded to 6 dp."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    seq = ev.select(
        "user_id", t.alias("t"), F.lag(t).over(w).alias("prev_t")
    )
    gaps = seq.filter(F.col("prev_t").isNotNull()).select(
        "user_id", (F.col("t") - F.col("prev_t")).alias("gap")
    )
    g = F.col("gap").cast("decimal(38,0)")
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum(g).cast("double").alias("s1"),
            F.sum(g * g).cast("double").alias("s2"),
        )
        .filter(F.col("n_gaps") >= 5)
        # s1 == 0 (every gap zero micros) would divide cv by zero:
        # ANSI Spark throws where DuckDB returns NULL — and a PERFECTLY
        # regular bot's variance can round to a tiny negative double
        # (DuckDB sqrt() throws on it), so clamp at 0.0 identically
        .filter(F.col("s1") > 0)
    )
    n = F.col("n_gaps")
    mean = F.col("s1") / n
    sd = F.sqrt(
        F.greatest(
            (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1),
            F.lit(0.0),
        )
    )
    return stats.select(
        "user_id",
        "n_gaps",
        F.round(mean / 1000000, 6).alias("mean_gap_s"),
        F.round(sd / 1000000, 6).alias("sd_gap_s"),
        F.round(sd / mean, 6).alias("cv"),
        (sd / mean < 0.5).alias("is_regular"),
    )


_CONC_GAP_US = 1800 * 1000000  # session gap, matches the 30-min rule


@register(
    "events_concurrency_curve",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev_t
  FROM events
), flagged AS (
  SELECT user_id, t, event_id,
    CASE WHEN prev_t IS NULL OR t - prev_t > {_CONC_GAP_US}
         THEN 1 ELSE 0 END AS new_s
  FROM seq
), sessioned AS (
  SELECT user_id, t,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sessions AS (
  SELECT user_id, sid, MIN(t) AS s_start, MAX(t) AS s_end
  FROM sessioned GROUP BY user_id, sid
), bounds AS (
  SELECT s_start AS t, 1 AS delta FROM sessions
  UNION ALL
  SELECT s_end AS t, -1 AS delta FROM sessions
), per_t AS (
  SELECT t, CAST(SUM(delta) AS BIGINT) AS net,
    CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS plus
  FROM bounds GROUP BY t
), curve AS (
  SELECT t, net, plus,
    SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - net
      + plus AS max_at_t
  FROM per_t
)
SELECT CAST(make_timestamp(t) AS DATE) AS day,
  CAST(MAX(max_at_t) AS BIGINT) AS peak_concurrency,
  CAST(COUNT(*) AS BIGINT) AS n_boundary_instants
FROM curve GROUP BY 1
""",
    tags=("integration", "analytics"),
)
def events_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OCCUPANCY — peak concurrent sessions per day (the
    capacity-planning curve behind connection pools, seat licensing
    and Little's-law dashboards): user sessions (30-minute gap rule,
    the same sessionization as win_sessionize) become ±1 BOUNDARY
    events at start/end, and concurrency at any instant is the prefix
    sum of boundaries — the classic sweep-line reduction that answers
    "how many intervals cover point t" for ALL t in one pass, where
    the naive interval × instant join is quadratic. The
    tie rule needs no intra-instant ordering at all: aggregating
    boundaries per instant first, the peak AT t is
    (prefix net BEFORE t) + (starts at t) — inclusive intervals, so
    same-instant starts count before same-instant ends, and a
    single-event session still registers concurrency 1.

    Plan shape: sessionization is one window shuffle on user_id;
    boundaries reduce to the DISTINCT-INSTANT frame (one hash agg);
    the Spark prefix runs as the two-pass day pattern —
    within-day prefix windows (day-sized partitions) plus a
    day-offset frame whose global window is calendar-domain
    (win_global_running_total's allowlisted shape) — so no
    unpartitioned row-scale sort exists, where the oracle (DuckDB)
    uses its plain global window as the independent formulation.
    Exact integer microseconds and counts throughout; no floats
    anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("t", "event_id")
    t = F.unix_micros("ts")
    seq = ev.select("user_id", t.alias("t"), "event_id").withColumn(
        "prev_t", F.lag("t").over(w_u)
    )
    flagged = seq.select(
        "user_id",
        "t",
        "event_id",
        F.when(
            F.col("prev_t").isNull()
            | (F.col("t") - F.col("prev_t") > _CONC_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessioned = flagged.withColumn("sid", F.sum("new_s").over(w_run))
    sessions = sessioned.groupBy("user_id", "sid").agg(
        F.min("t").alias("s_start"), F.max("t").alias("s_end")
    )
    bounds = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_start").alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.col("s_end").alias("t"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("b")
    ).select("b.t", "b.delta")
    per_t = bounds.groupBy("t").agg(
        F.sum("delta").cast("bigint").alias("net"),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("plus"),
    )
    day = F.to_date(F.timestamp_micros(F.col("t")))
    per_t = per_t.withColumn("day", day)
    w_day = (
        Window.partitionBy("day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = per_t.withColumn(
        "run_in_day", F.sum("net").over(w_day)
    )
    day_totals = per_t.groupBy("day").agg(
        F.sum("net").cast("bigint").alias("day_net")
    )
    w_days = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_totals.select(
        "day",
        F.coalesce(F.sum("day_net").over(w_days), F.lit(0)).alias(
            "day_offset"
        ),
    )
    curve = within.join(F.broadcast(offsets), "day").select(
        "day",
        "t",
        (
            F.col("day_offset")
            + F.col("run_in_day")
            - F.col("net")
            + F.col("plus")
        ).alias("max_at_t"),
    )
    return curve.groupBy("day").agg(
        F.max("max_at_t").cast("bigint").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundary_instants"),
    )


_STICK_WINDOW = 28  # trailing MAU window in days (inclusive)


@register(
    "events_stickiness_dau_mau",
    oracle=f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
mau AS (
  SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
  FROM days JOIN du
    ON du.d BETWEEN days.d - INTERVAL {_STICK_WINDOW - 1} DAY AND days.d
  GROUP BY days.d
)
SELECT dau.d AS day, dau.dau, mau.mau,
  round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.d = mau.d
""",
    tags=("integration", "events"),
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per day — the engagement-product headline
    metric (what fraction of the trailing-{_STICK_WINDOW}-day active
    base showed up today): daily active users, trailing monthly
    actives, and their ratio. A window SUM cannot compute MAU — a
    user active on several days must count ONCE per trailing window —
    so the trailing distinct runs as an EXPLODE-OFFSET equi-join:
    each (day, user) row of the reduced distinct frame fans out to
    the exactly-{_STICK_WINDOW} future spine days it contributes to
    (explode(sequence(d, d+{_STICK_WINDOW - 1}))), then an equi hash
    join with the broadcast observed-day spine drops contributions to
    days with no activity, and COUNT(DISTINCT user) per spine day
    collapses multi-day actives. (The first shipped form ran a
    broadcast NLJ band join whose PREDICATE work grew with
    |days| x |day,user| on a long calendar; this form does the same
    fan-out with a hash join and zero per-row predicate scans —
    VERDICT r9 #4.)

    Plan shape: one distinct reduction of raw events to (day, user) —
    the only corpus-sized stage — then a map-side explode (fixed
    x{_STICK_WINDOW} fan-out, independent of calendar length), one
    BroadcastHashJoin against the |days|-row spine, and two hash
    aggregations. At 100 TB: the (day, user) frame is
    |days| x |users| at worst — the same reduced frame
    events_rolling_active_users already prices — and the explode
    output is a fixed x{_STICK_WINDOW} of it, pruned by the spine
    join before the distinct-count shuffle."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), _STICK_WINDOW - 1)
            )
        ).alias("d"),
        "user_id",
    )
    mau = (
        contrib.join(F.broadcast(days), "d")
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return dau.join(mau, "d").select(
        F.col("d").alias("day"),
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "events_cohort_ltv",
    oracle="""
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY user_id
), cohort_size AS (
  SELECT d0, CAST(COUNT(*) AS BIGINT) AS n_users FROM first GROUP BY d0
), base AS (
  SELECT f.d0,
    CAST(floor(CAST(date_diff('day', f.d0, CAST(e.ts AS DATE)) AS DOUBLE)
               / 7) AS BIGINT) AS age_w,
    CAST(round(e.value, 2) AS DECIMAL(18,2)) AS v
  FROM events e JOIN first f ON e.user_id = f.user_id
  WHERE e.value IS NOT NULL AND e.event_type = 'purchase'
    AND CAST(e.ts AS DATE) >= f.d0
), cells AS (
  SELECT d0, age_w, SUM(v) AS rev, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM base GROUP BY d0, age_w
), cum AS (
  SELECT d0, age_w, rev, n_orders,
    SUM(rev) OVER (PARTITION BY d0 ORDER BY age_w) AS cum_rev
  FROM cells
)
SELECT c.d0 AS cohort_day, c.age_w, s.n_users, c.n_orders,
  CAST(c.rev AS DOUBLE) AS week_revenue,
  round(CAST(c.cum_rev AS DOUBLE) / s.n_users, 6) AS cum_ltv_per_user
FROM cum c JOIN cohort_size s ON c.d0 = s.d0
""",
    tags=("integration", "events"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LIFETIME VALUE — the revenue companion to
    events_retention_cohorts (that one counts who comes back; this one
    accumulates what they spend): users cohorted by FIRST-PURCHASE
    day, purchase revenue bucketed into weeks-since-first-purchase,
    and the running cumulative LTV per cohort user — the curve every
    growth team reads payback periods off. Pre-first-purchase rows are
    excluded (a purchase cannot precede the user's first purchase by
    construction, but the guard keeps the semantics explicit).

    Plan shape: one hash agg to per-user first-purchase day, a
    broadcast-sized (|users|-row) join back onto the purchase scan,
    one hash agg to the (cohort x age-week) cell frame, then the
    cumulative window PARTITIONED BY cohort over that DOMAIN-sized
    frame (|cohort days| x |weeks| cells — calendar x calendar, never
    row-scale). Revenue stays DECIMAL through the cumulative sum;
    doubles only at the final per-user division."""
    ev = load(spark, sf_dir, "events")
    purch = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.to_date("ts").alias("pd"),
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    first = purch.groupBy("user_id").agg(F.min("pd").alias("d0"))
    size = first.groupBy("d0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    base = (
        purch.join(first, "user_id")
        .filter(F.col("pd") >= F.col("d0"))
        .select(
            "d0",
            F.floor(
                F.datediff(F.col("pd"), F.col("d0")).cast("double") / 7
            ).cast("bigint").alias("age_w"),
            "v",
        )
    )
    cells = base.groupBy("d0", "age_w").agg(
        F.sum("v").alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("d0").orderBy("age_w")
    cum = cells.select(
        "d0",
        "age_w",
        "rev",
        "n_orders",
        F.sum("rev").over(w).alias("cum_rev"),
    )
    return cum.join(F.broadcast(size), "d0").select(
        F.col("d0").alias("cohort_day"),
        "age_w",
        "n_users",
        "n_orders",
        F.col("rev").cast("double").alias("week_revenue"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("n_users"), 6
        ).alias("cum_ltv_per_user"),
    )


@register(
    "events_inter_arrival",
    oracle="""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
      ORDER BY epoch_us(ts), event_id) AS pt
  FROM events
), gaps AS (
  SELECT CAST(floor((t - pt) / 60000000.0) AS BIGINT) AS gap_min,
    t - pt AS gap_us
  FROM seq WHERE pt IS NOT NULL
), dv AS (
  SELECT gap_min, CAST(COUNT(*) AS BIGINT) AS cnt,
    CAST(SUM(gap_us) AS BIGINT) AS sum_us
  FROM gaps GROUP BY gap_min
), cum AS (
  SELECT gap_min, cnt, sum_us,
    SUM(cnt) OVER (ORDER BY gap_min) AS cum,
    SUM(cnt) OVER () AS n, SUM(sum_us) OVER () AS tot_us
  FROM dv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_gaps,
  MIN(CASE WHEN cum >= CAST(floor((CAST(n AS DOUBLE) + 1) / 2) AS BIGINT)
      THEN gap_min END) AS median_gap_min,
  MIN(CASE WHEN cum >= CAST(floor((9 * CAST(n AS DOUBLE) + 9) / 10)
      AS BIGINT) THEN gap_min END) AS p90_gap_min,
  CAST(MIN(gap_min) AS BIGINT) AS min_gap_min,
  CAST(MAX(gap_min) AS BIGINT) AS max_gap_min,
  round(CAST(SUM(CASE WHEN gap_min = 0 THEN cnt ELSE 0 END) AS DOUBLE)
        / MAX(n), 6) AS frac_under_1min,
  round(CAST(MAX(tot_us) AS DOUBLE) / MAX(n) / 60000000, 6)
    AS mean_gap_min
FROM cum
""",
    tags=("integration", "events", "stats"),
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL time profile (per-user event gaps — the queueing
    statistic behind session-timeout choice, bot heuristics, and the
    reference's own 10 s poll cadence): per-user consecutive-event
    gaps via LAG on exact integer micros, then the gap distribution
    at MINUTE resolution — exact type-1 median and p90 over the
    minute-gap distinct frame, fraction under a minute, and the exact
    mean from integer-micro sums.

    Scale discipline: the per-user LAG window shuffles on the
    HIGH-cardinality user key (never a global sort); the quantile
    frame is gaps truncated to minutes, whose distinct domain is
    bounded by the calendar span in minutes (43 200 for the 30-day
    fixture) — it SATURATES while gap rows grow, which is why the
    global cumulative window over it is allowlisted (second-
    resolution gaps would NOT saturate; the truncation is the scale
    contract, same trade as fe_quantile_binning's 2-dp money
    domain). Mean stays exact: integer micros summed as BIGINT."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = ev.select(
        F.unix_micros("ts").alias("t"),
        F.lag(F.unix_micros("ts")).over(w_u).alias("pt"),
    )
    gaps = seq.filter(F.col("pt").isNotNull()).select(
        F.floor((F.col("t") - F.col("pt")) / 60000000)
        .cast("bigint")
        .alias("gap_min"),
        (F.col("t") - F.col("pt")).alias("gap_us"),
    )
    dv = gaps.groupBy("gap_min").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("gap_us").cast("bigint").alias("sum_us"),
    )
    w_cum = Window.partitionBy().orderBy("gap_min")
    w_all = Window.partitionBy()
    cum = dv.select(
        "gap_min",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("sum_us").over(w_all).alias("tot_us"),
    )
    med_rank = F.floor((F.col("n").cast("double") + 1) / 2).cast("bigint")
    p90_rank = F.floor(
        (9 * F.col("n").cast("double") + 9) / 10
    ).cast("bigint")
    return cum.agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min(
            F.when(F.col("cum") >= med_rank, F.col("gap_min"))
        ).alias("median_gap_min"),
        F.min(
            F.when(F.col("cum") >= p90_rank, F.col("gap_min"))
        ).alias("p90_gap_min"),
        F.min("gap_min").cast("bigint").alias("min_gap_min"),
        F.max("gap_min").cast("bigint").alias("max_gap_min"),
        F.round(
            F.sum(
                F.when(F.col("gap_min") == 0, F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.max("n"),
            6,
        ).alias("frac_under_1min"),
        F.round(
            F.max("tot_us").cast("double") / F.max("n") / 60000000, 6
        ).alias("mean_gap_min"),
    )


_FB_TRAIN_DAYS = 20  # backtest split: first 20 day-offsets train, rest test


@register(
    "eval_forecast_backtest",
    oracle=f"""
WITH d0 AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
), daily AS (
  SELECT event_type,
    CAST(date_diff('day', d0.d0, CAST(ts AS DATE)) AS BIGINT) AS t,
    CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM events CROSS JOIN d0 WHERE value IS NOT NULL
  GROUP BY event_type, CAST(date_diff('day', d0.d0, CAST(ts AS DATE)) AS BIGINT)
), fit AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
    CAST(SUM(t) AS BIGINT) AS sx,
    SUM(y) AS sy,
    SUM(t * y) AS sxy,
    CAST(SUM(t * t) AS BIGINT) AS sxx,
    arg_max(y, t) AS y_last
  FROM daily WHERE t < {_FB_TRAIN_DAYS} GROUP BY event_type
  HAVING COUNT(*) >= 2 AND COUNT(*) * SUM(t * t) > SUM(t) * SUM(t)
), coef AS (
  SELECT event_type, n_train, y_last,
    CAST(n_train * sxy - sx * sy AS DOUBLE)
      / CAST(n_train * sxx - sx * sx AS DOUBLE) AS slope,
    (CAST(sy AS DOUBLE)
     - CAST(n_train * sxy - sx * sy AS DOUBLE)
       / CAST(n_train * sxx - sx * sx AS DOUBLE) * sx) / n_train
      AS intercept
  FROM fit
), err AS (
  SELECT daily.event_type, coef.n_train, coef.slope, coef.intercept,
    CAST(round(abs(CAST(daily.y AS DOUBLE)
                   - (coef.intercept + coef.slope * daily.t)), 6)
         AS DECIMAL(18,6)) AS ae,
    CAST(round(abs(CAST(daily.y AS DOUBLE) - CAST(coef.y_last AS DOUBLE)), 6)
         AS DECIMAL(18,6)) AS ae_naive
  FROM daily JOIN coef ON daily.event_type = coef.event_type
  WHERE daily.t >= {_FB_TRAIN_DAYS}
)
SELECT event_type, n_train, CAST(COUNT(*) AS BIGINT) AS n_test,
  round(slope, 6) AS slope, round(intercept, 6) AS intercept,
  round(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 6) AS mae,
  round(CAST(SUM(ae_naive) AS DOUBLE) / COUNT(*), 6) AS mae_naive,
  round(1 - (CAST(SUM(ae) AS DOUBLE) / COUNT(*))
          / (CAST(SUM(ae_naive) AS DOUBLE) / COUNT(*)), 6) AS skill
FROM err GROUP BY event_type, n_train, slope, intercept
HAVING SUM(ae_naive) > 0
""",
    tags=("eval", "timeseries", "events"),
)
def eval_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTEST — the eval half the ts_* family was missing
    (ts_holt_linear/q_forecast_revenue FIT models; nothing measured
    whether forecasting is even working): hold out the last calendar
    days, fit the OLS trend on the first {_FB_TRAIN_DAYS} day-offsets
    per segment, score the holdout with MAE against the
    LAST-TRAIN-VALUE naive baseline, and report the skill score
    1 - mae/mae_naive (the hydrology/M-competition convention: skill
    <= 0 means the model loses to persistence and should not ship).

    Exactness: x is an integer day offset and y an exact DECIMAL
    daily sum, so ALL OLS moments (Σx, Σy, Σxy, Σxx) are exact
    fixed-point/integer — slope and intercept are single double
    divisions of exact quantities; each absolute error snaps to a
    6-dp DECIMAL before the order-free test-set sum (the
    agg_jackknife_variance discipline). Degenerate segments (fewer
    than 2 train days, zero x-variance, or a zero naive error that
    would divide the skill by 0) are excluded identically on both
    engines.

    Plan shape: one hash agg to the (segment x day) domain frame
    (1-row global min-date broadcast for the offset), one train-slice
    hash agg to |segments| coefficient rows (arg_max picks the naive
    anchor in the same pass), a broadcast join back onto the test
    slice, and one final hash agg. At 100 TB: one corpus scan, then
    calendar-domain arithmetic."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d0 = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("d0"))
            .cast("bigint")
            .alias("t"),
        )
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("y")
        )
    )
    fit = (
        daily.filter(F.col("t") < _FB_TRAIN_DAYS)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum("t").cast("bigint").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("t") * F.col("y")).alias("sxy"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
            F.max_by("y", "t").alias("y_last"),
        )
        .filter(
            (F.col("n_train") >= 2)
            & (
                F.col("n_train") * F.col("sxx")
                > F.col("sx") * F.col("sx")
            )
        )
    )
    slope = (
        F.col("n_train") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n_train") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    coef = fit.select(
        "event_type",
        "n_train",
        "y_last",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("n_train")
        ).alias("intercept"),
    )
    err = (
        daily.filter(F.col("t") >= _FB_TRAIN_DAYS)
        .join(F.broadcast(coef), "event_type")
        .select(
            "event_type",
            "n_train",
            "slope",
            "intercept",
            F.round(
                F.abs(
                    F.col("y").cast("double")
                    - (F.col("intercept") + F.col("slope") * F.col("t"))
                ),
                6,
            ).cast("decimal(18,6)").alias("ae"),
            F.round(
                F.abs(
                    F.col("y").cast("double")
                    - F.col("y_last").cast("double")
                ),
                6,
            ).cast("decimal(18,6)").alias("ae_naive"),
        )
    )
    out = err.groupBy("event_type", "n_train", "slope", "intercept").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("ae").alias("sae"),
        F.sum("ae_naive").alias("sae_naive"),
    ).filter(F.col("sae_naive") > 0)
    mae = F.col("sae").cast("double") / F.col("n_test")
    mae_n = F.col("sae_naive").cast("double") / F.col("n_test")
    return out.select(
        "event_type",
        "n_train",
        "n_test",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round(mae, 6).alias("mae"),
        F.round(mae_n, 6).alias("mae_naive"),
        F.round(1 - mae / mae_n, 6).alias("skill"),
    )


#: |z| threshold for calling a Mann-Kendall trend (two-sided 5%)
_MK_Z = "1.96"


@register(
    "ts_mann_kendall",
    oracle=f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
), pairs AS (
  SELECT a.event_type,
    CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn,
    CAST((b.v - a.v) AS DOUBLE) / (b.day - a.day) AS slope
  FROM d a JOIN d b
    ON a.event_type = b.event_type AND a.day < b.day
), s AS (
  SELECT event_type,
    CAST(SUM(sgn) AS BIGINT) AS s_stat,
    list_sort(list(slope))[
      CAST(floor((COUNT(*) + 1) / 2.0) AS BIGINT)] AS sen_slope
  FROM pairs GROUP BY event_type
), ties AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(tp * (tp - 1) * (2 * tp + 5)) AS BIGINT) AS tie_term
  FROM (
    SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS tp
    FROM d GROUP BY event_type, v
  ) GROUP BY event_type
), stats AS (
  SELECT s.event_type, ties.n_days, s.s_stat, s.sen_slope,
    (CAST(n_days AS DOUBLE) * (n_days - 1) * (2 * n_days + 5) - tie_term)
      / 18.0 AS var_s
  FROM s JOIN ties ON s.event_type = ties.event_type
)
SELECT event_type, n_days, s_stat,
  round(var_s, 6) AS var_s,
  round(CASE WHEN var_s <= 0 THEN 0.0
             WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
             WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
             ELSE 0.0 END, 6) AS z,
  CASE WHEN var_s <= 0 THEN 'no_trend'
       WHEN s_stat > 0 AND (s_stat - 1) / sqrt(var_s) > {_MK_Z}
         THEN 'increasing'
       WHEN s_stat < 0 AND (s_stat + 1) / sqrt(var_s) < -{_MK_Z}
         THEN 'decreasing'
       ELSE 'no_trend' END AS trend,
  round(sen_slope, 6) AS sen_slope
FROM stats
""",
    tags=("integration", "timeseries", "stats"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST + THEIL-SEN SLOPE per segment — the
    nonparametric "is this metric drifting" monitor (Mann 1945,
    Kendall 1975; Sen 1968): S = sum of pairwise sign comparisons over
    the daily series, tie-corrected variance, continuity-corrected Z,
    and the Theil-Sen slope (median of all pairwise slopes — robust to
    outliers where OLS in agg_ols_trend is not; the two entries
    answer the same question under different contamination
    assumptions). This is the standard pre-alarm for data-quality
    drift on metrics too noisy for parametric trend fits.

    Exactness: the daily series is the exact DECIMAL(18,2) frame; S
    is an integer CASE sum (never a float); tie counts are integers;
    the single pairwise-slope median is a TYPE-1 lower-middle rank
    from the sorted slope list (each slope a one-shot DECIMAL-diff /
    integer-days division — identical doubles on both engines, and
    doubles sort identically). The z guard handles the all-tied
    var_s = 0 case identically on both engines.

    Plan shape: one hash agg to the (segment x day) domain frame,
    then ONE segment-keyed self-join producing the C(n,2) pairwise
    frame — QUADRATIC in days-per-segment but the domain saturates
    (a decade is C(3653,2) ≈ 6.7M pairs per segment, constant in row
    count; at 100 TB the corpus is touched once by the first agg).
    collect_list holds one slope list per segment, domain-bounded."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("v")
    )
    a = d.select(
        "event_type", F.col("day").alias("da"), F.col("v").alias("va")
    )
    b = d.select(
        "event_type", F.col("day").alias("db"), F.col("v").alias("vb")
    )
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db")).select(
        "event_type",
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sgn"),
        (
            (F.col("vb") - F.col("va")).cast("double")
            / F.datediff("db", "da")
        ).alias("slope"),
    )
    k = F.floor((F.count(F.lit(1)) + 1) / F.lit(2.0)).cast("int")
    s = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s_stat"),
        F.element_at(F.array_sort(F.collect_list("slope")), k).alias(
            "sen_slope"
        ),
    )
    ties = (
        d.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(
                F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
            )
            .cast("bigint")
            .alias("tie_term"),
        )
    )
    nd = F.col("n_days")
    stats = s.join(ties, "event_type").select(
        "event_type",
        "n_days",
        "s_stat",
        "sen_slope",
        (
            (nd.cast("double") * (nd - 1) * (2 * nd + 5) - F.col("tie_term"))
            / 18.0
        ).alias("var_s"),
    )
    ss, vs = F.col("s_stat"), F.col("var_s")
    z = (
        F.when(vs <= 0, F.lit(0.0))
        .when(ss > 0, (ss - 1) / F.sqrt(vs))
        .when(ss < 0, (ss + 1) / F.sqrt(vs))
        .otherwise(F.lit(0.0))
    )
    zlit = F.lit(float(_MK_Z))
    return stats.select(
        "event_type",
        "n_days",
        "s_stat",
        F.round(vs, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.when(vs <= 0, F.lit("no_trend"))
        .when((ss > 0) & ((ss - 1) / F.sqrt(vs) > zlit), "increasing")
        .when((ss < 0) & ((ss + 1) / F.sqrt(vs) < -zlit), "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
        F.round("sen_slope", 6).alias("sen_slope"),
    )


#: cross-correlation max lead/lag in days
_CCF_MAX_LAG = 4


@register(
    "ts_cross_correlation",
    oracle=f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
), lagged AS (
  SELECT a.event_type AS lead_type, b.event_type AS lag_type, l.lag,
    a.v AS x, b.v AS y
  FROM d a
  CROSS JOIN (SELECT unnest(generate_series(0, {_CCF_MAX_LAG})) AS lag) l
  JOIN d b ON b.event_type <> a.event_type
          AND b.day = a.day + CAST(l.lag AS INTEGER)
), moments AS (
  SELECT lead_type, lag_type, lag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * y) AS DOUBLE) AS sxy,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM lagged GROUP BY lead_type, lag_type, lag
)
SELECT lead_type, lag_type, CAST(lag AS BIGINT) AS lag, n,
  round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0 THEN 0.0
        ELSE (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
    AS ccf
FROM moments
WHERE n >= 3
""",
    tags=("integration", "timeseries", "stats"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION FUNCTION between segment pairs — the lead-lag
    detector ts_autocorrelation can't express (that entry correlates a
    series with ITS OWN past; this one asks whether segment A's daily
    revenue leads segment B's by k days, the input to "views today
    predict purchases Thursday" causal screening and to forecasting
    feature selection): Pearson correlation of (x(d), y(d+lag)) per
    ordered segment pair for lags 0..{_CCF_MAX_LAG}, n >= 3 overlap
    required.

    Exactness: all five moments are EXACT DECIMAL sums over the
    DECIMAL(18,2) daily frame (x*y is DECIMAL(38,4) — no double
    accumulates across rows); the correlation is one fixed-form double
    expression per output row, with the zero-variance guard written
    identically on both engines (a constant series has undefined
    correlation; emitted as 0.0 rather than dropping the row so the
    pair's coverage stays visible).

    Plan shape: one hash agg to the (segment x day) domain frame, an
    in-row explode of the {_CCF_MAX_LAG + 1}-lag sequence, one
    day-shifted self-join (domain x lags — saturating), one hash agg to
    |pairs| x |lags| output rows. The corpus is scanned once."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("v")
    )
    a = d.select(
        F.col("event_type").alias("lead_type"),
        F.col("day").alias("da"),
        F.col("v").alias("x"),
        F.explode(
            F.sequence(F.lit(0), F.lit(_CCF_MAX_LAG))
        ).alias("lag"),
    )
    b = d.select(
        F.col("event_type").alias("lag_type"),
        F.col("day").alias("db"),
        F.col("v").alias("y"),
    )
    lagged = (
        a.withColumn("db", F.expr("date_add(da, CAST(lag AS INT))"))
        .join(b, ["db"])
        .filter(F.col("lag_type") != F.col("lead_type"))
    )
    moments = lagged.groupBy("lead_type", "lag_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return moments.filter(n >= 3).select(
        "lead_type",
        "lag_type",
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.round(
            F.when(den <= 0, F.lit(0.0)).otherwise(num / F.sqrt(den)), 6
        ).alias("ccf"),
    )


#: minimum common-neighbor support for a predicted link
_AA_MIN_CN = 2


@register(
    "graph_adamic_adar",
    oracle=f"""
WITH {_TRI_EDGE_CTE}, und AS (
  SELECT s AS u, t AS z FROM e
  UNION ALL
  SELECT t AS u, s AS z FROM e
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY u
), wedges AS (
  SELECT l.u AS u, r.u AS w, l.z AS z
  FROM und l JOIN und r ON l.z = r.z AND l.u < r.u
), cand AS (
  SELECT wedges.u, wedges.w, wedges.z FROM wedges
  LEFT JOIN e ON e.s = wedges.u AND e.t = wedges.w
  WHERE e.s IS NULL
), scored AS (
  SELECT c.u, c.w,
    CAST(COUNT(*) AS BIGINT) AS common_neighbors,
    CAST(SUM(CAST(round(1.0 / ln(dz.dg), 9) AS DECIMAL(18,9)))
         AS DECIMAL(18,9)) AS aa_sum,
    CAST(SUM(CAST(round(1.0 / dz.dg, 9) AS DECIMAL(18,9)))
         AS DECIMAL(18,9)) AS ra_sum
  FROM cand c JOIN deg dz ON dz.u = c.z
  GROUP BY c.u, c.w
  HAVING COUNT(*) >= {_AA_MIN_CN}
)
SELECT s.u, s.w, s.common_neighbors,
  round(CAST(aa_sum AS DOUBLE), 6) AS adamic_adar,
  round(CAST(ra_sum AS DOUBLE), 6) AS resource_alloc,
  round(CAST(s.common_neighbors AS DOUBLE)
        / (du.dg + dw.dg - s.common_neighbors), 6) AS jaccard
FROM scored s
JOIN deg du ON du.u = s.u
JOIN deg dw ON dw.u = s.w
""",
    tags=("integration", "graph"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION scores over the co-purchase graph — the
    missing-edge ranker (Liben-Nowell & Kleinberg 2003) beside the
    registry's descriptive graph metrics: for every NON-adjacent pair
    with >= {_AA_MIN_CN} common neighbors, the Adamic-Adar index
    (sum of 1/ln(deg) over shared neighbors — rare mutual friends
    count more), the resource-allocation index (1/deg — the exact-
    arithmetic sibling), and neighborhood Jaccard. This is the
    candidate generator for "users who should be linked but aren't":
    fraud-ring discovery, recommendation seeding, ER blocking hints.

    Exactness: every common neighbor z has deg(z) >= 2 by construction
    (it is adjacent to both endpoints), so ln(deg) > 0 and no guard
    ambiguity exists; each 1/ln and 1/deg term snaps to a 9-dp
    DECIMAL before the ORDER-FREE decimal sum (the winsorized-oracle
    lesson: never let a parallel DOUBLE sum decide a 6-dp round), and
    1/deg is an IEEE-exact division of identical inputs on both
    engines. Jaccard is integer arithmetic until one final division.

    Plan shape: reuses the _materialized_edges session artifact (the
    cap-saturated, md5-deterministic edge list every graph entry
    shares — built once per session+sf), doubles it into an adjacency
    frame, and generates wedges with a BROADCAST neighbor join (the
    adjacency is |days| x day-cap x 2 rows — saturating, megabytes
    even at a decade) whose per-z score terms are precomputed on the
    |nodes|-row degree frame. The ONE real shuffle is the (u, w) hash
    agg with map-side combine collapsing the SUM(deg^2) wedge fan-out
    to the <= C(|nodes|,2) pair frame; adjacency removal and the
    min-cn filter then run as a broadcast left_anti on that reduced
    frame (identical result to filtering wedges first — aggregation
    per pair is independent of which pairs survive). No
    CartesianProduct anywhere; the wedge fan-out is cap-bounded per
    day, never row-scale."""
    edges = _materialized_edges(spark, sf_dir)
    und = edges.select(
        F.col("s").alias("u"), F.col("t").alias("z")
    ).unionAll(edges.select(F.col("t").alias("u"), F.col("s").alias("z")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
    # per-z score terms computed ONCE on the |nodes|-row degree frame,
    # not per wedge row: the wedge generator then only reads columns.
    # Degree-1 nodes can never be a common neighbor (a wedge center
    # has two distinct neighbors), so they are dropped BEFORE the
    # 1/ln(deg) term — ln(1) = 0 would throw under ANSI — and the
    # inner join below loses no wedge.
    dz = deg.filter(F.col("dg") >= 2).select(
        F.col("u").alias("z"),
        F.round(F.lit(1.0) / F.log(F.col("dg")), 9)
        .cast("decimal(18,9)")
        .alias("aa_term"),
        F.round(F.lit(1.0) / F.col("dg"), 9)
        .cast("decimal(18,9)")
        .alias("ra_term"),
    )
    # the session artifact is a single parquet file: spread the probe
    # side so the SUM(deg^2) wedge fan-out generates on all cores, not
    # one task
    left = und.select(F.col("u"), F.col("z")).repartition(32, "z")
    right = und.select(F.col("u").alias("w"), F.col("z"))
    wedges = (
        left.join(F.broadcast(right), "z")
        .filter(F.col("u") < F.col("w"))
        .join(F.broadcast(dz), "z")
    )
    # aggregate FIRST (map-side combine collapses the wedge fan-out to
    # the <= C(|nodes|,2) pair frame), drop adjacent pairs AFTER via a
    # broadcast anti against the small edge list — same result, but the
    # anti-join and the >= min-cn filter run on the reduced frame
    scored = (
        wedges.groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum("aa_term").cast("decimal(18,9)").alias("aa_sum"),
            F.sum("ra_term").cast("decimal(18,9)").alias("ra_sum"),
        )
        .filter(F.col("common_neighbors") >= _AA_MIN_CN)
    )
    nonadj = scored.join(
        F.broadcast(edges),
        (edges.s == scored.u) & (edges.t == scored.w),
        "left_anti",
    )
    du = deg.select(F.col("u"), F.col("dg").alias("du"))
    dw = deg.select(F.col("u").alias("w"), F.col("dg").alias("dw"))
    return (
        nonadj.join(F.broadcast(du), "u")
        .join(F.broadcast(dw), "w")
        .select(
            "u",
            "w",
            "common_neighbors",
            F.round(F.col("aa_sum").cast("double"), 6).alias("adamic_adar"),
            F.round(F.col("ra_sum").cast("double"), 6).alias(
                "resource_alloc"
            ),
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("du") + F.col("dw") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "fe_best_split",
    oracle="""
WITH pts AS (
  SELECT CAST(round(value, 1) AS DECIMAL(18,1)) AS x,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
), by_x AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS n_x,
    CAST(SUM(y) AS BIGINT) AS pos_x
  FROM pts GROUP BY x
), cum AS (
  SELECT x,
    CAST(SUM(n_x) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
    CAST(SUM(pos_x) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl,
    CAST(SUM(n_x) OVER () AS BIGINT) AS n,
    CAST(SUM(pos_x) OVER () AS BIGINT) AS pos
  FROM by_x
), gains AS (
  SELECT CAST(x AS DOUBLE) AS threshold, nl AS n_left, n - nl AS n_right,
    (1.0 - (CAST(pos AS DOUBLE) * pos + CAST(n - pos AS DOUBLE) * (n - pos))
           / (CAST(n AS DOUBLE) * n))
    - (CAST(nl AS DOUBLE) / n)
      * (1.0 - (CAST(pl AS DOUBLE) * pl
                + CAST(nl - pl AS DOUBLE) * (nl - pl))
               / (CAST(nl AS DOUBLE) * nl))
    - (CAST(n - nl AS DOUBLE) / n)
      * (1.0 - (CAST(pos - pl AS DOUBLE) * (pos - pl)
                + CAST((n - nl) - (pos - pl) AS DOUBLE)
                  * ((n - nl) - (pos - pl)))
               / (CAST(n - nl AS DOUBLE) * (n - nl))) AS gain
  FROM cum WHERE nl < n
)
SELECT threshold, n_left, n_right, round(gain, 6) AS gini_gain,
  ROW_NUMBER() OVER (ORDER BY round(gain, 6) DESC, threshold) = 1
    AS is_best
FROM gains
""",
    tags=("integration", "fe", "stats"),
)
def fe_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECISION-STUMP SPLIT FINDER — the CART inner loop (Breiman
    1984) as a set operation, the feature-engineering primitive
    fe_woe_iv / fe_quantile_binning don't give you: for every
    candidate threshold over the 1-dp value domain, the GINI IMPURITY
    GAIN of splitting "x <= t" against the is-purchase label, with the
    argmax flagged. This is how a scalable tree trainer evaluates ALL
    split points of a numeric feature in one pass (the Spark MLlib /
    XGBoost histogram trick): aggregate to per-value (count, positives),
    prefix-scan, score each boundary from the four cumulative
    integers. Gini (not entropy) keeps the arithmetic ln-free.

    Exactness: per-value counts are one exact hash agg; the prefix
    sums are INTEGER window sums over the sorted value-domain frame;
    each gain is one fixed-form double expression over six integers
    (written textually identically on both engines), snapped to 6 dp
    BEFORE the argmax rank so the is_best tie-break (lowest
    threshold) is decided on identical values. The nl < n filter
    removes the degenerate full-left split, so no denominator is
    zero under ANSI.

    Plan shape: one corpus-scan hash agg to the 1-dp value domain
    (saturating — ~a few thousand rows at ANY corpus size), then
    unpartitioned windows over that domain frame (the agg_ks_test
    allowlist pattern) and one rank. At 100 TB: one scan, domain-sized
    everything else; per-feature parallelism is a groupBy(feature)
    away."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        F.round("value", 1).cast("decimal(18,1)").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    by_x = pts.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum("y").cast("bigint").alias("pos_x"),
    )
    w_pre = W.orderBy("x").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = by_x.select(
        "x",
        F.sum("n_x").over(w_pre).cast("bigint").alias("nl"),
        F.sum("pos_x").over(w_pre).cast("bigint").alias("pl"),
        F.sum("n_x").over(w_all).cast("bigint").alias("n"),
        F.sum("pos_x").over(w_all).cast("bigint").alias("pos"),
    )
    n, nl, pos, pl = F.col("n"), F.col("nl"), F.col("pos"), F.col("pl")
    nr, pr = n - nl, pos - pl

    def gini(cnt, p):
        return 1.0 - (
            p.cast("double") * p + (cnt - p).cast("double") * (cnt - p)
        ) / (cnt.cast("double") * cnt)

    gain = (
        gini(n, pos)
        - (nl.cast("double") / n) * gini(nl, pl)
        - (nr.cast("double") / n) * gini(nr, pr)
    )
    gains = cum.filter(nl < n).select(
        F.col("x").cast("double").alias("threshold"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        F.round(gain, 6).alias("gini_gain"),
    )
    w_rank = W.orderBy(F.col("gini_gain").desc(), "threshold")
    return gains.select(
        "threshold",
        "n_left",
        "n_right",
        "gini_gain",
        (F.row_number().over(w_rank) == 1).alias("is_best"),
    )
