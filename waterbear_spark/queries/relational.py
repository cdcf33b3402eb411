"""Relational operator catalog — scans, filters, joins, aggregates, windows,
sorts, set ops, scalar function families (SURVEY.md §2b).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; each has
an ANSI-SQL twin in ``ORACLES`` runnable by DuckDB on the same parquet. All
computed columns are aliased identically on both sides, and every float
aggregate follows the decimal-sum determinism pattern from ``tables.py``.

Scale notes are given per query: what shuffles, what broadcasts, what the
plan must look like at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.operators import asof_join, top_k_per_group
from waterbear_spark.queries.tables import DEC, davg, dsum, oracle_davg, oracle_dsum, table


# ---------------------------------------------------------------------------
# TPC-H-style analytical queries
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: lineitem pricing summary (TPC-H Q1 shape).

    Scale: single scan -> partial hash agg (6 groups) -> tiny shuffle ->
    final agg. No joins; whole-stage codegen end to end. On scans wider
    than the core count the only data movement is 6 groups x
    n_partitions partial rows; on narrow scans (fewer files than cores,
    e.g. the single-file bench split) _fan_out first repartitions the
    filtered 6-column projection so the partial agg parallelizes.
    """
    from waterbear_spark.queries.llm import _fan_out

    # widen the scan before the 8-aggregate decimal partial agg: the
    # single-file bench split otherwise runs the whole map-side pass on
    # one task (med 1.86 -> 1.45 s at sf0.1, interleaved A/B); the
    # explicit project keeps the repartition to the 6 needed columns.
    # No-op on production-width scans (_fan_out's file-count gate).
    li = _fan_out(
        spark,
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ),
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc", scale=4),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_dsum('l_quantity', 'sum_qty')},
       {oracle_dsum('l_extendedprice', 'sum_base_price')},
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {oracle_davg('l_quantity', 'avg_qty')},
       {oracle_davg('l_extendedprice', 'avg_price')},
       {oracle_davg('l_discount', 'avg_disc', 4)},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment revenue top-10 (TPC-H Q3 shape): 3-way join + agg + top-k.

    Scale: customer is the small side after the segment filter -> broadcast
    it into orders; orders join lineitem shuffles on orderkey (the natural
    key both sides). Top-10 rides on the rounded revenue so membership is
    deterministic.
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation within one region (TPC-H Q5 shape): 6-way join.

    Scale: region/nation/supplier/customer are dimensions -> broadcast all;
    the only shuffle is lineitem x orders on orderkey. Catalyst prunes the
    region scan to 1 row before broadcasting the nation filter.
    """
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = f"""
SELECT n_name, {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# projection / filter / joins
# ---------------------------------------------------------------------------

def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; both must reach the parquet scan
    (PushedFilters / 3-column ReadSchema in .explain)."""
    return (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 1000) & (F.col("c_mktsegment") == "BUILDING"))
        .select(
            "c_custkey",
            F.upper(F.col("c_name")).alias("name_upper"),
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy("c_custkey")
    )


FILTER_PROJECT_SQL = """
SELECT c_custkey, UPPER(c_name) AS name_upper, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having at least one big order. Scale: semi join
    shuffles only the key column of the right side; no row duplication."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no urgent order."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta mixed join: orders whose price exceeds 50x the
    customer's balance. Scale: the equi part keeps this a hash join; the
    theta predicate is evaluated post-match (no nested loop)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_totalprice > cust.c_acctbal * 50),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_THETA_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders JOIN customer
  ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 50
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order at
    or before the event time (union-timeline operator; see
    waterbear_spark.operators.asof for the 100 TB rationale)."""
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    joined = asof_join(
        events,
        orders,
        on_left="user_id",
        on_right="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").cast("date").alias("last_orderdate"),
    ).orderBy("event_id")


ASOF_SQL = """
SELECT e.event_id, e.user_id,
       o.o_orderkey AS last_orderkey,
       CAST(o.o_orderdate AS DATE) AS last_orderdate
FROM events e
LEFT JOIN LATERAL (
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 1
) o ON TRUE
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate hash agg over two keys."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            dsum(F.col("l_extendedprice"), "sum_price"),
            davg(F.col("l_tax"), "avg_tax", scale=4),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_STATS_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       {oracle_dsum('l_extendedprice', 'sum_price')},
       {oracle_davg('l_tax', 'avg_tax', 4)}
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate, no driver work."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> priority -> grand total)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flags."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {oracle_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# windows / sort / set ops
# ---------------------------------------------------------------------------

def window_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 parts per brand by retail price (ranked window; Spark inserts
    a WindowGroupLimit so only 2 rows per brand cross the shuffle)."""
    part = table(spark, sf_dir, "part")
    return top_k_per_group(
        part,
        group_cols=["p_brand"],
        order_cols=[F.col("p_retailprice").desc(), F.col("p_partkey")],
        k=2,
    ).select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("p_brand", "rank")


WINDOW_TOPK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, CAST(rank AS INTEGER) AS rank
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rank
    FROM part
)
WHERE rank <= 2
ORDER BY p_brand, rank
"""


def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag per customer ordered by order date."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("odate"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(running), 2)
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS running_total,
       LAG(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def top_n_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge of 20 rows), never a full sort."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


TOP_N_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    cust_nations = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.intersect(supp_nations).orderBy("nationkey")


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    cust_nations = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.subtract(supp_nations).orderBy("nationkey")


SET_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def union_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-filtered projections, then agg."""
    orders = table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("klass"), "o_totalprice"
    )
    cheap = orders.filter(F.col("o_totalprice") < 50000).select(
        F.lit("cheap").alias("klass"), "o_totalprice"
    )
    return (
        urgent.unionByName(cheap)
        .groupBy("klass")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "sum_price"))
        .orderBy("klass")
    )


UNION_SQL = f"""
SELECT klass, COUNT(*) AS n, {oracle_dsum('o_totalprice', 'sum_price')}
FROM (
    SELECT 'urgent' AS klass, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'cheap' AS klass, o_totalprice FROM orders WHERE o_totalprice < 50000
)
GROUP BY klass
ORDER BY klass
"""


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, split/size, concat, substring."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.length(F.col("p_name")).alias("name_len"),
        F.size(F.split(F.col("p_name"), " ")).alias("n_words"),
        F.concat_ws("#", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
    ).orderBy("p_partkey")


STRING_FUNCS_SQL = """
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       LENGTH(p_name) AS name_len,
       CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INTEGER) AS n_words,
       p_brand || '#' || p_type AS brand_type,
       SUBSTRING(p_type, 1, 5) AS type_prefix
FROM part
ORDER BY p_partkey
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: year/month extraction, monthly aggregation."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        )
        .orderBy("yr", "mo")
    )


DATE_FUNCS_SQL = f"""
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
       CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_price')},
       MIN(CAST(o_orderdate AS DATE)) AS first_day
FROM orders
GROUP BY 1, 2
ORDER BY yr, mo
"""


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    events = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(k.alias("k"), "value", "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("k").alias("max_k"),
            davg(F.col("k"), "avg_k"),
            dsum(F.col("value"), "sum_value"),
        )
        .orderBy("event_type")
    )


JSON_FUNCS_SQL = f"""
SELECT event_type, COUNT(*) AS n_events,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS max_k,
       {oracle_davg("CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)", 'avg_k')},
       {oracle_dsum('value', 'sum_value')}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4): the raw
    JSON payload is parsed once into Spark's binary variant encoding,
    then fields are extracted with ``variant_get`` path expressions —
    the modern replacement for per-access ``get_json_object`` string
    re-parsing, and the right scan-side representation for a 100 TB
    bronze layer of heterogeneous JSON.

    ``try_variant_get`` on an absent path must yield NULL (not error),
    which the n_missing column asserts across every row.
    """
    events = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        events.select(
            k.alias("k"),
            F.try_variant_get(v, "$.absent", "int").alias("absent"),
        )
        .groupBy(F.floor(F.col("k") / 10).alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("absent").alias("n_missing"),
        )
        .orderBy("k_decade")
    )


VARIANT_EVENTS_SQL = """
SELECT CAST(FLOOR(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) / 10.0)
            AS BIGINT) AS k_decade,
       COUNT(*) AS n_events,
       MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS max_k,
       COUNT(CAST(JSON_EXTRACT_STRING(props, '$.absent') AS INTEGER)) AS n_missing
FROM events
GROUP BY 1
ORDER BY 1
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream (batch view; the same
    F.window works under readStream + watermark — see streaming module)."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows over events (each event lands in exactly two
    windows). Oracle: per-event unnest of its two hour-grid window starts."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_SLIDING_SQL = f"""
SELECT ws AS window_start, event_type,
       COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM (
    SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                   time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS ws,
           event_type, value
    FROM events
)
GROUP BY ws, event_type
ORDER BY window_start, event_type
"""


def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via the bucketized range-join operator (see
    operators/rangejoin.py): events against 2-hour interval rows, no
    nested loop — the bucket equi-join shuffles integer keys only."""
    from waterbear_spark.operators.rangejoin import range_join

    events = table(spark, sf_dir, "events").select("ts", "value")
    hours = events.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    starts = hours.unionByName(
        hours.select((F.col("h") - F.expr("INTERVAL 1 HOUR")).alias("h"))
    ).distinct()
    ranges = starts.select(
        F.col("h").alias("window_start"),
        (F.col("h") + F.expr("INTERVAL 2 HOURS")).alias("window_end"),
    )
    joined = range_join(events, ranges, "ts", "window_start", "window_end", 3600)
    return (
        joined.groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .orderBy("window_start")
    )


RANGE_JOIN_SQL = f"""
SELECT ws AS window_start, COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM (
    SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                   time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS ws,
           value
    FROM events
)
GROUP BY ws
ORDER BY window_start
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "filter_project": filter_project,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_theta": join_theta,
    "asof_last_order": asof_last_order,
    "agg_stats": agg_stats,
    "agg_distinct": agg_distinct,
    "rollup_orders": rollup_orders,
    "cube_lineitem": cube_lineitem,
    "window_topk_parts": window_topk_parts,
    "window_running_totals": window_running_totals,
    "top_n_orders": top_n_orders,
    "set_intersect_nations": set_intersect_nations,
    "set_except_nations": set_except_nations,
    "union_priority_classes": union_priority_classes,
    "string_functions": string_functions,
    "date_functions": date_functions,
    "json_functions": json_functions,
    "variant_events": variant_events,
    "events_hourly": events_hourly,
    "events_sliding": events_sliding,
    "range_join_windows": range_join_windows,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "filter_project": FILTER_PROJECT_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_theta": JOIN_THETA_SQL,
    "asof_last_order": ASOF_SQL,
    "agg_stats": AGG_STATS_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "rollup_orders": ROLLUP_SQL,
    "cube_lineitem": CUBE_SQL,
    "window_topk_parts": WINDOW_TOPK_SQL,
    "window_running_totals": WINDOW_RUNNING_SQL,
    "top_n_orders": TOP_N_SQL,
    "set_intersect_nations": SET_INTERSECT_SQL,
    "set_except_nations": SET_EXCEPT_SQL,
    "union_priority_classes": UNION_SQL,
    "string_functions": STRING_FUNCS_SQL,
    "date_functions": DATE_FUNCS_SQL,
    "json_functions": JSON_FUNCS_SQL,
    "variant_events": VARIANT_EVENTS_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_sliding": EVENTS_SLIDING_SQL,
    "range_join_windows": RANGE_JOIN_SQL,
}
