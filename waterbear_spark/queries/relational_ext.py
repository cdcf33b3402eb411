"""Relational catalog extensions: outer joins, GROUPING SETS, analytic
windows (ntile/lag/lead), correlated subqueries, math functions, and
approximate aggregates (rows-only check — approx sketches have no exact
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import dsum, oracle_dsum, table


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-nation customer and supplier counts, keeping
    nations that only appear on one side."""
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.withColumnRenamed("nationkey", "c_nk")
        .join(supp.withColumnRenamed("nationkey", "s_nk"),
              F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                 FROM supplier GROUP BY s_nationkey) s
  ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): totals by
    (status), by (priority), and grand total."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               {oracle_dsum('o_totalprice', 'sum_price')}
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / lag / lead / percent_rank over part prices per brand."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        F.lag("p_retailprice").over(w).alias("prev_price"),
        F.lead("p_retailprice").over(w).alias("next_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("p_brand", "p_partkey")


WINDOW_ANALYTICS_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
       CAST(NTILE(4) OVER w AS INTEGER) AS price_quartile,
       LAG(p_retailprice) OVER w AS prev_price,
       LEAD(p_retailprice) OVER w AS next_price,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
ORDER BY p_brand, p_partkey
"""


def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: parts that ship in large quantity (>45)."""
    for name in ("part", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_ex")
    return spark.sql("""
        SELECT p_partkey, p_brand
        FROM part_ex
        WHERE EXISTS (SELECT 1 FROM lineitem_ex
                      WHERE l_partkey = p_partkey AND l_quantity > 45)
        ORDER BY p_partkey
    """)


EXISTS_SUBQUERY_SQL = """
SELECT p_partkey, p_brand
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity > 45)
ORDER BY p_partkey
"""


def scalar_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sc")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM orders_sc
        WHERE o_totalprice > (SELECT {oracle_dsum('o_totalprice', 's').replace(' AS s', '')}
                              / COUNT(*) * 1.5 FROM orders_sc)
        ORDER BY o_orderkey
    """)


SCALAR_SUBQUERY_SQL = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT {oracle_dsum('o_totalprice', 's').replace(' AS s', '')}
                      / COUNT(*) * 1.5 FROM orders)
ORDER BY o_orderkey
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family: abs/round/floor/ceil/sqrt/ln/pow/pmod — all on
    deterministic per-row arithmetic."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.abs(F.col("l_extendedprice") * -1).alias("abs_price"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.round(F.sqrt(F.col("l_extendedprice")), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.pmod(F.col("l_orderkey"), 97).cast("long").alias("key_mod"),
    ).orderBy("l_orderkey")


MATH_FUNCS_SQL = """
SELECT l_orderkey,
       ABS(l_extendedprice * -1) AS abs_price,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
       ROUND(LN(l_extendedprice), 6) AS ln_price,
       ROUND(POW(l_tax + 1, 2), 6) AS tax_sq,
       CAST(l_orderkey % 97 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar family: map_from_arrays construction, element_at lookup,
    map_keys / cardinality — surfaced as plain columns (map cell reprs
    differ across engines; lookups don't)."""
    orders = table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("f_n"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("o_n"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("p_n"),
        )
    )
    status_map = F.map_from_arrays(
        F.array(F.lit("F"), F.lit("O"), F.lit("P")),
        F.array(F.col("f_n"), F.col("o_n"), F.col("p_n")),
    )
    return (
        counts.select("o_custkey", status_map.alias("m"))
        .select(
            "o_custkey",
            F.element_at("m", "O").alias("open_orders"),
            F.element_at("m", "F").alias("finished_orders"),
            F.size("m").alias("n_statuses"),
            F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("statuses"),
        )
        .orderBy("o_custkey")
    )


MAP_FUNCS_SQL = """
WITH counts AS (
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_n
    FROM orders GROUP BY o_custkey
),
mapped AS (
    SELECT o_custkey, MAP(['F', 'O', 'P'], [f_n, o_n, p_n]) AS m FROM counts
)
SELECT o_custkey,
       m['O'][1] AS open_orders,
       m['F'][1] AS finished_orders,
       CAST(CARDINALITY(m) AS INTEGER) AS n_statuses,
       ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(m)), ',') AS statuses
FROM mapped
ORDER BY o_custkey
"""


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (rows-only check: sketch
    estimates are engine-specific by nature; the driver records row count
    + schema only). At 100 TB this replaces exact distinct's full shuffle
    with fixed-size sketches merged map-side."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per market segment x order status. Spark's
    pivot with an explicit value list stays a single hash aggregate (no
    second pass to discover values)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.lit(1)))
        .orderBy("c_mktsegment")
    )


PIVOT_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide part metrics to long (metric, value) rows."""
    part = table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["retailprice", "size"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("p_partkey", "metric")
    )


UNPIVOT_SQL = """
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
ORDER BY p_partkey, metric
"""


def percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``; rounded to absorb interpolation fp)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


PERCENTILES_SQL = """
SELECT o_orderstatus,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def regex_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + conditional scalar family (coalesce / nullif /
    greatest / least / CASE)."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "#([0-9]+)", 1)
        .cast("long")
        .alias("name_number"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(bldg)"))
        .alias("segment_or_tag"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("nonneg_bal"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("capped_bal"),
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("normal")
        .alias("balance_class"),
    ).orderBy("c_custkey")


REGEX_CONDITIONAL_SQL = """
SELECT c_custkey,
       CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS name_number,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(bldg)') AS segment_or_tag,
       GREATEST(c_acctbal, 0.0) AS nonneg_bal,
       LEAST(c_acctbal, 5000.0) AS capped_bal,
       CASE WHEN c_acctbal < 0 THEN 'delinquent'
            WHEN c_acctbal < 1000 THEN 'low'
            ELSE 'normal' END AS balance_class
FROM customer
ORDER BY c_custkey
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream in batch: a new
    session starts after a >30-min silence per user; report per-session
    start, event count, duration, and value total.

    The batch twin of ``F.session_window`` (streaming sessions live in
    ``streaming/windows.py``) and the standard clickstream/training-log
    shape: lag -> boundary flag -> running sum = session index -> group.

    Scale: exactly ONE shuffle — the window partition-by-user exchange —
    and the subsequent groupBy reuses the same (user_id) clustering, so
    Catalyst plans it shuffle-free on top. Second diffs are computed on
    whole-second boundaries (``unix_timestamp`` floor) to match DuckDB's
    ``date_diff('second', ...)`` boundary-count semantics exactly.
    """
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("session_idx", F.sum("is_new").over(wrun).cast("int"))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_sec"
            ),
            dsum(F.col("value"), "sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new,
           event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT *,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
               AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(DATE_DIFF('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec,
       {oracle_dsum('value', 'sum_value')}
FROM sessioned
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over tokenized documents: size, distinct,
    sort+slice, membership, position, and a higher-order transform+max —
    all JVM-side Catalyst higher-order functions (no Python on any row).
    """
    from waterbear_spark.queries.llm import _tokens

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", _tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
    )
    return docs.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("int").alias("n_distinct"),
        F.concat_ws(
            "-", F.slice(F.array_sort(F.array_distinct("toks")), 1, 3)
        ).alias("first3"),
        F.array_contains("toks", "the").alias("has_the"),
        F.array_position("toks", "data").cast("int").alias("pos_data"),
        F.array_max(F.transform("toks", F.length)).cast("int").alias("longest"),
    ).orderBy("doc_id")


def _array_functions_sql() -> str:
    from waterbear_spark.queries.llm import TOKENS_SQL

    return f"""
WITH tok AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '-')
           AS first3,
       list_contains(toks, 'the') AS has_the,
       CAST(COALESCE(list_position(toks, 'data'), 0) AS INTEGER) AS pos_data,
       CAST(list_max(list_transform(toks, t -> length(t))) AS INTEGER) AS longest
FROM tok
WHERE len(toks) > 0
ORDER BY doc_id
"""


def explode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral unnest with ordinality): each document's
    first five tokens as (doc_id, pos, token) rows — the Generate operator,
    Spark's row-expansion path (flatten nested data into relational form).

    Scale: Generate is pipeline-local (no shuffle); the slice bounds
    output to 5 rows/doc before expansion, so the operator never amplifies
    the scan by the full token count.
    """
    from waterbear_spark.queries.llm import _tokens

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.slice(_tokens(F.col("text")), 1, 5).alias("s"))
        .filter(F.size("s") > 0)
    )
    return docs.select(
        "doc_id", F.posexplode("s").alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("int")).orderBy("doc_id", "pos")


def _explode_ordinality_sql() -> str:
    from waterbear_spark.queries.llm import TOKENS_SQL

    return f"""
WITH tok AS (
    SELECT doc_id, list_slice({TOKENS_SQL}, 1, 5) AS s FROM documents
)
SELECT doc_id,
       CAST(generate_subscripts(s, 1) - 1 AS INTEGER) AS pos,
       unnest(s) AS token
FROM tok
WHERE len(s) > 0
ORDER BY doc_id, pos
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based, not row-based): per market
    segment, how many customers sit within ±500 of each customer's
    account balance. RANGE frames bound by *values* need no self-join —
    one sort per partition serves every row's neighbourhood count.
    """
    cust = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"))
        .rangeBetween(-500, 500)
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_500"),
    ).orderBy("c_custkey")


WINDOW_RANGE_FRAME_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                      RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
           AS n_within_500
FROM customer
ORDER BY c_custkey
"""


def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING()/GROUPING_ID() markers — the standard way to
    distinguish 'subtotal row' NULLs from genuine NULL group keys."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ROLLUP_GROUPING_ID_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


_STRATA_RATES = {"AUTOMOBILE": 50, "BUILDING": 25, "MACHINERY": 10}  # pct


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-segment keep rates applied
    via md5(key) mod 100 — reproducible across runs, partitionings, and
    engines (unlike ``sampleBy``'s RNG), which is what a training
    pipeline needs for auditable downsampling. Unlisted strata drop out.

    Scale: the hash gate is row-local (filter before any shuffle — at
    100 TB it rides the scan); only the per-stratum count aggregation
    exchanges data.
    """
    cust = table(spark, sf_dir, "customer")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat|"), F.col("c_custkey").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = F.create_map(
        *[F.lit(x) for kv in _STRATA_RATES.items() for x in kv]
    )[F.col("c_mktsegment")]
    return (
        cust.filter(bucket < rate)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )


def _stratified_sample_sql() -> str:
    rates = " ".join(
        f"WHEN '{seg}' THEN {pct}" for seg, pct in _STRATA_RATES.items()
    )
    return f"""
SELECT c_mktsegment, COUNT(*) AS n_sampled,
       MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
FROM customer
WHERE CAST(('0x' || substr(md5('strat|' || CAST(c_custkey AS VARCHAR)), 1, 15))
           AS UBIGINT)::BIGINT % 100
      < (CASE c_mktsegment {rates} ELSE NULL END)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 bins over [0, 600000)):
    the one-pass distribution sketch behind profiling dashboards. Bin
    assignment is row-local arithmetic; only 20 keys shuffle."""
    orders = table(spark, sf_dir, "orders")
    width = 30000.0
    bin_id = F.least(F.floor(F.col("o_totalprice") / width), F.lit(19)).cast("int")
    return (
        orders.groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("lo", (F.col("bin") * width).cast("double"))
        .withColumn("hi", ((F.col("bin") + 1) * width).cast("double"))
        .select("bin", "lo", "hi", "n_orders")
        .orderBy("bin")
    )


HISTOGRAM_SQL = """
SELECT bin, CAST(bin * 30000.0 AS DOUBLE) AS lo,
       CAST((bin + 1) * 30000.0 AS DOUBLE) AS hi,
       COUNT(*) AS n_orders
FROM (SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS INTEGER) AS bin
      FROM orders)
GROUP BY bin
ORDER BY bin
"""


def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable) pattern: the daily rollup is
    computed FROM the hourly rollup, not from raw events — the cascade
    that makes dashboard hierarchies cheap (hourly materializes once;
    every coarser grain re-aggregates ~24× fewer rows).

    Exactness: the hourly sums stay DECIMAL until the final grain, so
    re-aggregation is associative with no float drift — the oracle runs
    the identical two-level cascade.
    """
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value_exact"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour_start").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value_exact"), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


ROLLUP_CASCADE_SQL = """
WITH hourly AS (
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(20,6))) AS sum_value_exact
    FROM events
    GROUP BY 1, 2
)
SELECT CAST(DATE_TRUNC('day', hour_start) AS DATE) AS day, event_type,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(sum_value_exact), 2) AS DOUBLE) AS sum_value
FROM hourly
GROUP BY 1, 2
ORDER BY 1, 2
"""


_KMV_K = 64
_KMV_SCALE = float(2**60)


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch over event users: hash each
    distinct value to [0,1), keep the K smallest hashes, estimate
    distinct ≈ (K-1)/h_K. Unlike HLL (``approx_distinct``, rows-only
    check), the md5-based hash makes this sketch fully deterministic, so
    the estimate — and its error vs the exact count — is oracle-checked
    bit-for-bit across engines.

    Scale: the sketch is a TakeOrdered of K rows after a distinct — at
    100 TB keep per-partition K-mins map-side (aggregate with a bounded
    heap) and merge; the estimate math is unchanged.
    """
    events = table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    kth = (
        events.select(F.col("user_id")).distinct()
        .select(h.alias("h"))
        .orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("k_seen"))
    )
    exact = events.agg(F.countDistinct("user_id").alias("n_exact"))
    return kth.crossJoin(F.broadcast(exact)).select(
        F.round(
            F.lit(_KMV_K - 1) / (F.col("h_k").cast("double") / F.lit(_KMV_SCALE)),
            2,
        ).alias("kmv_estimate"),
        "k_seen",
        "n_exact",
    )


KMV_SQL = f"""
WITH hashes AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT AS h
    FROM (SELECT DISTINCT user_id FROM events)
),
kth AS (
    SELECT MAX(h) AS h_k, COUNT(*) AS k_seen
    FROM (SELECT h FROM hashes ORDER BY h LIMIT {_KMV_K})
)
SELECT ROUND({_KMV_K - 1} / (CAST(h_k AS DOUBLE) / {_KMV_SCALE!r}), 2) AS kmv_estimate,
       k_seen,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact
FROM kth
"""


_D2 = "decimal(12,2)"


def ols_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass OLS regression + Pearson correlation of
    ``l_extendedprice`` on ``l_quantity``, computed from exact decimal
    moment sums (Σx, Σy, Σxy, Σx², Σy²) so the one final double formula
    is bit-identical across engines — the deterministic alternative to
    ``F.corr``/``regr_slope``, whose float accumulation is
    partition-order-dependent.

    Scale: one map-side-combinable aggregate over the fact table — five
    sums and a count, no shuffle wider than a single row. This is the
    moments pattern every sufficient-statistics ML fit (linear/ridge
    regression, ANOVA) reduces to on Spark.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_D2)
    y = F.col("l_extendedprice").cast(_D2)
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = n * F.col("sxy") - sx * sy
    var_x = n * F.col("sxx") - sx * sx
    var_y = n * F.col("syy") - sy * sy
    slope = cov_n / var_x
    return sums.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("r"),
    )


OLS_SQL = """
WITH sums AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
    FROM lineitem
)
SELECT n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
FROM sums
"""


_WMED_BUCKET = 1000.0  # price-bucket width for the two-pass quantile


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median of ``l_extendedprice`` per return
    flag, via the scale-correct TWO-PASS bucketed quantile. A naive
    per-group cumulative window puts each whole group in ONE task (3
    return flags -> parallelism 3 forever, the classic low-cardinality
    window trap); instead:

    1. rows reduce to per-(flag, price-bucket) weight sums — a map-side-
       combinable aggregate over ~|flags|x100 cells;
    2. a cumulative window over that TINY bucket relation locates the
       crossing bucket (first whose running weight reaches half the
       total) and its preceding offset;
    3. only rows of the crossing bucket (a ~1/100 slice, broadcast-
       pruned) pay the exact in-bucket cumulative sort, seeded with the
       bucket offset.

    Weights accumulate as exact decimals end-to-end, so the picked price
    is identical to the one-window oracle formulation — the hash-match
    proves the rewrite. Same discipline at 100 TB: only step 3 sorts
    rows, and it touches one bucket per group.
    """
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(20,6)")
    rows = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        qty.alias("w"),
        F.floor(F.col("l_extendedprice") / _WMED_BUCKET).alias("bkt"),
    )

    # pass 1: per-bucket weight, cumulative across buckets, group totals
    per_bucket = rows.groupBy("l_returnflag", "bkt").agg(
        F.sum("w").alias("bw")
    )
    bcum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    buckets = per_bucket.withColumn(
        "bcum", F.sum("bw").over(bcum_w)
    ).withColumn("tot", F.sum("bw").over(tot_w))
    crossing = (
        buckets.filter(F.col("bcum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min_by(F.struct("bkt", "bcum", "bw", "tot"), "bkt").alias("c")
        )
        .select(
            "l_returnflag",
            F.col("c.bkt").alias("c_bkt"),
            (F.col("c.bcum") - F.col("c.bw")).alias("offset"),
            F.col("c.tot").alias("tot"),
        )
    )

    # pass 2: exact cumulative only inside the crossing bucket
    cum_in = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(
            F.broadcast(crossing),
            (rows.l_returnflag == crossing.l_returnflag)
            & (rows.bkt == crossing.c_bkt),
        )
        .drop(crossing.l_returnflag)
        .withColumn("cum", F.col("offset") + F.sum("w").over(cum_in))
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.round(F.max("tot"), 2).cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


WEIGHTED_MEDIAN_SQL = """
WITH cumw AS (
    SELECT l_returnflag, l_extendedprice,
           SUM(CAST(l_quantity AS DECIMAL(20,6))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum,
           SUM(CAST(l_quantity AS DECIMAL(20,6))) OVER (
               PARTITION BY l_returnflag
           ) AS tot
    FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median,
       CAST(ROUND(MAX(tot), 2) AS DOUBLE) AS total_weight
FROM cumw
WHERE cum * 2 >= tot
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_NTILE_BUCKETS = 8


_EQD_WIDTH = 30000.0  # price-bucket width for the two-pass order statistics


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals, computed
    WITHOUT a global sort. NTILE's answer is fully determined by 16
    order statistics (each tile's first/last rank, sizes are arithmetic
    on N), so:

    1. per price-bucket counts + a cumulative window over that ~20-row
       relation locate which bucket holds each boundary rank;
    2. the 16 boundary ranks are generated *on* the bucket rows (pure
       rank arithmetic from N — no scalar join) and kept where they land;
    3. only the hit buckets sort, partitioned by bucket id, and the rows
       matching a local rank are picked by equi-join.

    Exactly the NTILE output — the oracle still runs the plain window —
    but the biggest sort is one price-bucket instead of the whole table,
    and it parallelizes per bucket. (The sketch route via approx
    quantiles is the alternative when exactness can be traded.)
    """
    k = _NTILE_BUCKETS
    orders = table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderkey").alias("key"),
        F.floor(F.col("o_totalprice") / _EQD_WIDTH).alias("pb"),
    )

    cum_w = (
        Window.orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pbc = (
        rows.groupBy("pb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .withColumn("n_total", F.sum("cnt").over(Window.partitionBy()))
    )

    # per tile i: start = (i-1)q + least(i-1, r) + 1, end = iq + least(i, r);
    # tiles with sz = 0 (n_total < bucket count) must emit NO boundaries —
    # their degenerate ranks would land inside other tiles — matching
    # NTILE, which simply produces fewer buckets on tiny inputs
    boundary = F.expr(
        f"""
        filter(
          flatten(transform(sequence(1, {k}), i -> array(
            named_struct(
              'tile', i, 'which', 'lo',
              'rk', (i-1) * (n_total div {k}) + least(i-1, n_total % {k}) + 1,
              'sz', (i * (n_total div {k}) + least(i, n_total % {k}))
                    - ((i-1) * (n_total div {k}) + least(i-1, n_total % {k}))),
            named_struct(
              'tile', i, 'which', 'hi',
              'rk', i * (n_total div {k}) + least(i, n_total % {k}),
              'sz', (i * (n_total div {k}) + least(i, n_total % {k}))
                    - ((i-1) * (n_total div {k}) + least(i-1, n_total % {k})))
          ))),
          s -> s.sz > 0 AND s.rk > cum_prev AND s.rk <= cum)
        """
    )
    targets = (
        pbc.select("pb", "cum_prev", F.explode(boundary).alias("t"))
        .select(
            "pb",
            F.col("t.tile").alias("tile"),
            F.col("t.which").alias("which"),
            (F.col("t.rk") - F.col("cum_prev")).alias("local_rk"),
            F.col("t.sz").alias("sz"),
        )
    )

    rn_w = Window.partitionBy("pb").orderBy("v", "key")
    ranked = (
        rows.join(F.broadcast(targets.select("pb").distinct()), "pb")
        .withColumn("rn", F.row_number().over(rn_w))
        .withColumnRenamed("pb", "r_pb")
    )
    picked = ranked.join(
        F.broadcast(targets),
        on=[
            ranked.r_pb == targets.pb,
            ranked.rn == targets.local_rk,
        ],
    ).select("tile", "which", "v", "sz")
    return (
        picked.groupBy("tile")
        .agg(
            F.max(F.when(F.col("which") == "lo", F.col("v"))).alias("lo"),
            F.max(F.when(F.col("which") == "hi", F.col("v"))).alias("hi"),
            F.max("sz").alias("n"),
        )
        .select(F.col("tile").alias("bucket"), "lo", "hi", "n")
        .orderBy("bucket")
    )


EQUIDEPTH_SQL = f"""
SELECT bucket, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       COUNT(*) AS n
FROM (
    SELECT o_totalprice,
           NTILE({_NTILE_BUCKETS}) OVER (
               ORDER BY o_totalprice, o_orderkey
           ) AS bucket
    FROM orders
)
GROUP BY bucket
ORDER BY bucket
"""


_ISLAND_TOP = 10


_ISLAND_BLOCK = 8192  # key-range block width for partitioned detection


def key_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the fulfilled-order (``status F``) key
    space: contiguous key runs found with the classic
    ``key − row_number()`` grouping trick (consecutive keys share the
    difference), returning the 10 longest islands. The detector for
    "which ranges of a sequence actually exist" — retention ranges,
    missing-id audits, compaction planning.

    Scale: the run detection is PARTITIONED by key-range block (the
    window trick runs per block, parallel), and since islands can only
    merge at block edges, a second gaps-and-islands pass over just the
    edge-touching islands (≤2 per block — tiny) stitches cross-block
    chains. Interior islands pass through untouched. Same answer as the
    one-window oracle, no global sort of the key space.
    """
    from waterbear_spark.operators.islands import find_islands

    keys = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .distinct()
    )
    return (
        find_islands(keys, "o_orderkey", block=_ISLAND_BLOCK)
        .orderBy(F.col("n_keys").desc(), "island_start")
        .limit(_ISLAND_TOP)
    )


KEY_ISLANDS_SQL = f"""
SELECT island_start, island_end, n_keys
FROM (
    SELECT MIN(o_orderkey) AS island_start,
           MAX(o_orderkey) AS island_end,
           COUNT(*) AS n_keys
    FROM (
        SELECT o_orderkey,
               o_orderkey - ROW_NUMBER() OVER (ORDER BY o_orderkey) AS grp
        FROM (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    )
    GROUP BY grp
)
ORDER BY n_keys DESC, island_start
LIMIT {_ISLAND_TOP}
"""


_BAND = 1.0  # price distance threshold


def band_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity band join: pairs of same-status orders whose total
    prices differ by ≤ 1.0, counted per status — WITHOUT a nested-loop
    inequality join. Prices bucketize to unit-width bins; each left row
    probes its own and both neighbour bins (a 3-way explode), the join is
    a plain equi-join on (status, bin), and the exact |Δprice| filter
    runs join-local. ``a < b`` on the key canonicalizes pairs.

    Scale: the explode triples one side, then everything is hash
    partitioned by (status, bin) — candidate pairs are only ever
    bin-local, the same bucketization trick as ``operators/rangejoin.py``
    applied to value distance instead of intervals.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    left = orders.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_totalprice").alias("p1"),
        F.explode(
            F.array(
                F.floor("o_totalprice") - 1,
                F.floor("o_totalprice"),
                F.floor("o_totalprice") + 1,
            )
        ).alias("bin"),
    )
    right = orders.select(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_totalprice").alias("p2"),
        F.floor("o_totalprice").alias("bin"),
    )
    return (
        left.join(right, ["st", "bin"])
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.col("p1") - F.col("p2")) <= _BAND)
        )
        .groupBy(F.col("st").alias("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("o_orderstatus")
    )


BAND_JOIN_SQL = f"""
WITH left_side AS (
    SELECT o_orderstatus AS st, o_orderkey AS k1, o_totalprice AS p1,
           UNNEST([FLOOR(o_totalprice) - 1,
                   FLOOR(o_totalprice),
                   FLOOR(o_totalprice) + 1]) AS bin
    FROM orders
),
right_side AS (
    SELECT o_orderstatus AS st, o_orderkey AS k2, o_totalprice AS p2,
           FLOOR(o_totalprice) AS bin
    FROM orders
)
SELECT l.st AS o_orderstatus, COUNT(*) AS n_pairs
FROM left_side l JOIN right_side r ON l.st = r.st AND l.bin = r.bin
WHERE l.k1 < r.k2 AND ABS(l.p1 - r.p2) <= {_BAND}
GROUP BY l.st
ORDER BY o_orderstatus
"""


def winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) mean: order totals clipped to the exact
    interpolated [p05, p95] band per status, then averaged with the exact
    decimal-sum rule. The percentile thresholds are the only interpolated
    floats, computed by the identical formula in both engines; clipping
    and the final division are deterministic.

    Scale: two passes over one shuffle key — a percentile aggregate
    (|groups| rows, broadcast back) and a map-side-combinable mean.
    """
    orders = table(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        orders.join(F.broadcast(bounds), "o_orderstatus")
        .select("o_orderstatus", clipped.alias("c"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("c").cast("decimal(20,6)")).cast("double")
                / F.count("c"),
                4,
            ).alias("winsorized_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


WINSORIZED_SQL = """
WITH bounds AS (
    SELECT o_orderstatus,
           QUANTILE_CONT(o_totalprice, 0.05) AS lo,
           QUANTILE_CONT(o_totalprice, 0.95) AS hi
    FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(o_totalprice, lo), hi)
                           AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*), 4) AS winsorized_mean,
       COUNT(*) AS n
FROM orders o JOIN bounds b ON o.o_orderstatus = b.o_orderstatus
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of (quantity, price, discount)
    in ONE pass: every moment sum (Σx, Σxy, Σx², …) accumulates exactly
    as decimals in a single aggregate, then each of the three
    correlations is one deterministic double formula — the sufficient-
    statistics pattern of ``ols_quantity_price`` generalized to a matrix.

    Scale: one map-side-combinable aggregate over the fact table, 9 sums
    + a count, single-row shuffle; the matrix unpivots driver-free from
    that one row.
    """
    li = table(spark, sf_dir, "lineitem")
    cols = {
        "qty": F.col("l_quantity").cast(_D2),
        "price": F.col("l_extendedprice").cast(_D2),
        "disc": F.col("l_discount").cast("decimal(12,4)"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    names = list(cols)
    for a in names:
        aggs.append(F.sum(cols[a]).cast("double").alias(f"s_{a}"))
        aggs.append(F.sum(cols[a] * cols[a]).cast("double").alias(f"s_{a}{a}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(F.sum(cols[a] * cols[b]).cast("double").alias(f"s_{a}{b}"))
    sums = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"s_{a}{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            (n * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (n * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        return F.round(num / den, 6)

    pairs = [
        sums.select(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            corr(a, b).alias("r"),
        )
        for i, a in enumerate(names)
        for b in names[i + 1:]
    ]
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_a", "col_b")


CORRELATION_SQL = """
WITH sums AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_qtyqty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_priceprice,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS s_disc,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS s_discdisc,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_qtyprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS s_qtydisc,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS s_pricedisc
    FROM lineitem
)
SELECT 'qty' AS col_a, 'price' AS col_b,
       ROUND((n * s_qtyprice - s_qty * s_price)
             / SQRT((n * s_qtyqty - s_qty * s_qty)
                    * (n * s_priceprice - s_price * s_price)), 6) AS r
FROM sums
UNION ALL
SELECT 'qty', 'disc',
       ROUND((n * s_qtydisc - s_qty * s_disc)
             / SQRT((n * s_qtyqty - s_qty * s_qty)
                    * (n * s_discdisc - s_disc * s_disc)), 6)
FROM sums
UNION ALL
SELECT 'price', 'disc',
       ROUND((n * s_pricedisc - s_price * s_disc)
             / SQRT((n * s_priceprice - s_price * s_price)
                    * (n * s_discdisc - s_disc * s_disc)), 6)
FROM sums
ORDER BY col_a, col_b
"""


QUERIES = {
    "correlation_matrix": correlation_matrix,
    "band_join_orders": band_join_orders,
    "winsorized_mean_price": winsorized_mean_price,
    "key_islands": key_islands,
    "weighted_median_price": weighted_median_price,
    "equidepth_histogram": equidepth_histogram,
    "ols_quantity_price": ols_quantity_price,
    "rollup_cascade": rollup_cascade,
    "kmv_distinct_sketch": kmv_distinct_sketch,
    "sessionize_events": sessionize_events,
    "explode_ordinality": explode_ordinality,
    "window_range_frame": window_range_frame,
    "rollup_grouping_id": rollup_grouping_id,
    "stratified_sample": stratified_sample,
    "histogram_totalprice": histogram_totalprice,
    "array_functions": array_functions,
    "pivot_segment_status": pivot_segment_status,
    "unpivot_part_metrics": unpivot_part_metrics,
    "percentiles_by_status": percentiles_by_status,
    "regex_conditional": regex_conditional,
    "map_functions": map_functions,
    "join_full_outer": join_full_outer,
    "grouping_sets_orders": grouping_sets_orders,
    "window_analytics": window_analytics,
    "exists_subquery": exists_subquery,
    "scalar_in_subquery": scalar_in_subquery,
    "math_functions": math_functions,
    "approx_distinct": approx_distinct,
}

ORACLES = {
    "correlation_matrix": CORRELATION_SQL,
    "band_join_orders": BAND_JOIN_SQL,
    "winsorized_mean_price": WINSORIZED_SQL,
    "key_islands": KEY_ISLANDS_SQL,
    "weighted_median_price": WEIGHTED_MEDIAN_SQL,
    "equidepth_histogram": EQUIDEPTH_SQL,
    "ols_quantity_price": OLS_SQL,
    "rollup_cascade": ROLLUP_CASCADE_SQL,
    "kmv_distinct_sketch": KMV_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "explode_ordinality": _explode_ordinality_sql(),
    "window_range_frame": WINDOW_RANGE_FRAME_SQL,
    "rollup_grouping_id": ROLLUP_GROUPING_ID_SQL,
    "stratified_sample": _stratified_sample_sql(),
    "histogram_totalprice": HISTOGRAM_SQL,
    "array_functions": _array_functions_sql(),
    "pivot_segment_status": PIVOT_SQL,
    "unpivot_part_metrics": UNPIVOT_SQL,
    "percentiles_by_status": PERCENTILES_SQL,
    "regex_conditional": REGEX_CONDITIONAL_SQL,
    "map_functions": MAP_FUNCS_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "grouping_sets_orders": GROUPING_SETS_SQL,
    "window_analytics": WINDOW_ANALYTICS_SQL,
    "exists_subquery": EXISTS_SUBQUERY_SQL,
    "scalar_in_subquery": SCALAR_SUBQUERY_SQL,
    "math_functions": MATH_FUNCS_SQL,
    # approx_distinct: intentionally no oracle (rows-only)
}
