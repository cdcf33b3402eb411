"""The remaining TPC-H query shapes (q2, q4, q9, q11, q12, q13, q15, q17,
q20, q21, q22), adapted to the driver's star schema — together with
``relational.py`` / ``tpch_more.py`` this completes all 22 TPC-H
optimizer stressors. Adaptations (the schema has no partsupp table, ship
modes, or commit/receipt dates): lineitem serves as the part↔supplier
bridge, ``l_extendedprice / l_quantity`` is the unit-cost proxy, and
``o_orderpriority`` / ``l_returnflag`` stand in for ship mode and late
delivery.

Determinism follows SURVEY.md §7: decimal-exact sums, identical aliases
and rounding in both engines; correlated subqueries are decorrelated on
the Spark side (join against a grouped min/max/avg) while the DuckDB
oracle keeps the correlated form — both must agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import DEC, dsum, oracle_dsum, table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD mid-size part, the EUROPE
    supplier(s) achieving the minimum unit cost — a correlated-min
    subquery, decorrelated into a per-part min join.

    Scale: the (part, supplier) cost table is built with ONE shuffle of
    lineitem; the per-part min reuses that partitioning (partkey is a
    prefix of the groupBy key, so the second agg is shuffle-local after
    AQE). supplier/nation/region/part are all broadcast probes.
    """
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    )
    costs = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_costs = costs.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        costs.join(
            min_costs,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            # round through exact decimal: ROUND on a raw double at a
            # half boundary (x.xxxx5) differs between engines
            F.round(F.col("cost").cast(DEC), 4).cast("double").alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = """
WITH costs AS (
    SELECT l_partkey, l_suppkey, s_name, n_name,
           MIN(l_extendedprice / l_quantity) AS cost
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY 1, 2, 3, 4
)
SELECT p_partkey, p_name, s_name, n_name,
       CAST(ROUND(CAST(cost AS DECIMAL(20,6)), 4) AS DOUBLE) AS unit_cost
FROM costs
JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
  AND cost = (SELECT MIN(c2.cost) FROM costs c2
              WHERE c2.l_partkey = costs.l_partkey)
ORDER BY p_partkey, s_name
"""


def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority where EXISTS a returned
    line — the canonical semi-join decorrelation.

    Scale: the EXISTS becomes a left-semi hash join on orderkey; the
    returnflag filter shrinks the build side at the scan.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    returned = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation and
    order year, profit on widget parts. Cost proxy: 60% of retail price
    per unit (no partsupp.ps_supplycost in this schema).

    Scale: one fact-fact shuffle (lineitem⋈orders on orderkey); part,
    supplier, nation broadcast. The LIKE filter prunes part before the
    broadcast, shrinking every probe.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("nation", "o_year")
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount)'
                    ' - 0.6 * p_retailprice * l_quantity', 'profit')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of the
    global total — grouped agg compared against a scalar subquery over
    the same aggregate.

    Scale: the part-value table shuffles once; the global total is a
    single-row re-aggregation of that (already small) table, broadcast
    back as a literal-like cross join — no second pass over lineitem.
    """
    li = table(spark, sf_dir, "lineitem")
    value = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    pv = li.groupBy("l_partkey").agg(F.sum(value).alias("val"))
    total = pv.agg(F.sum("val").alias("total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("val").cast("double") * 1500 > F.col("total").cast("double")
        )
        .select(
            "l_partkey",
            F.round("val", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH pv AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS val
    FROM lineitem GROUP BY 1
)
SELECT l_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) * 1500 > (SELECT CAST(SUM(val) AS DOUBLE) FROM pv)
ORDER BY part_value DESC, l_partkey
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (urgent vs non-urgent orders)
    per line status over a fact-fact join — CASE-inside-SUM on a join
    output (ship modes don't exist here; returnflag plays the grouping
    role).
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count — a
    LEFT OUTER join with a join-condition filter, then two stacked
    aggregations (per-customer count, then histogram of counts).

    Scale: outer join shuffles on custkey; the second agg's input is one
    row per customer, so its shuffle is tiny. The priority filter lives
    in the join condition (filtering before the join preserves
    customers with zero qualifying orders).
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    a grouped revenue view equality-compared against its own MAX scalar.
    Exact-decimal revenue makes the `= MAX(...)` comparison safe across
    engines (no float-equality hazard).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_rev"))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders, where
    "small" is relative to the part's own average quantity — a
    correlated AVG subquery, decorrelated into a grouped-avg join.

    Scale: per-part averages are one lineitem shuffle on partkey; the
    result (one row per part) broadcasts back onto the fact scan, so
    the correlated comparison costs no second fact shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0),
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q17_SQL = """
WITH pa AS (
    SELECT l_partkey AS pa_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY 1
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0,
             2) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa ON l_partkey = pa_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a large volume of some
    widget part in 1997 — nested IN/EXISTS subqueries, decorrelated into
    a grouped-threshold table and two semi joins.

    Scale: the (supplier, part) volume table is one fact shuffle;
    part-name filtering is a broadcast semi probe; the final supplier
    semi join is against a distinct-supplier set that AQE sees as tiny.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    widget_parts = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    nation = table(spark, sf_dir, "nation")
    sp = (
        li.join(
            F.broadcast(widget_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(sp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 45
)
ORDER BY s_suppkey
"""


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted): for
    finalized multi-supplier orders, suppliers who were the ONLY one with
    returned lines — EXISTS (another supplier participated) plus NOT
    EXISTS (another supplier also returned), the hardest decorrelation in
    the suite: one semi and one anti join, both with a residual
    inequality on top of the orderkey equi-key.
    """
    li = table(spark, sf_dir, "lineitem")
    orders_f = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l1 = l1.join(
        orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (none since 2000), per nation — a scalar AVG subquery plus
    NOT EXISTS, decorrelated into a broadcast scalar and an anti join.

    Scale: the positive-balance average is one tiny agg broadcast to
    every customer partition; the anti join on custkey is the only
    shuffle. Customer-side filters run before the anti join, shrinking
    its probe side.
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = f"""
SELECT n_name, COUNT(*) AS numcust,
       {oracle_dsum('c_acctbal', 'totacctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_count": q4_priority_count,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_shipping": q12_priority_shipping,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_sole_returner": q21_sole_returner,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_priority_count": Q4_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity": Q17_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_sole_returner": Q21_SQL,
    "q22_idle_customers": Q22_SQL,
}
