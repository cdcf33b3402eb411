"""Skew-mitigation operators as oracle-checked catalog entries.

Salting redistributes hot keys across shuffle partitions without changing
results — which is exactly what makes it oracle-checkable: the DuckDB
twin is the PLAIN aggregation/join, and the hash-match proves the salted
plan computes identical answers while spreading the hot key's load
``salt``-fold (the straggler-killer at 100 TB; see ``operators/skew.py``).

Sums run over DECIMAL so the two-phase combine is exact regardless of
how salting splits the partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.operators.skew import salted_agg, salted_join
from waterbear_spark.queries.tables import DEC, table

_SALT = 16


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over ``events`` by type (5 hot keys
    across the whole table — the worst-case group cardinality for a
    plain one-shuffle agg at scale).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast(DEC).alias("value")
    )
    out = salted_agg(
        ev,
        key_cols=["event_type"],
        aggs={"value": "sum", "event_type": "count"},
        salt=_SALT,
    )
    return out.select(
        "event_type",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        F.col("count_event_type").alias("n_events"),
    ).orderBy("event_type")


_SALTED_AGG_SQL = """
SELECT event_type,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dimension join: lineitem (skew-prone on partkey)
    against part, each key spread over 16 shuffle partitions, rolled up
    per brand. The oracle is the plain join — identical output, only the
    physical distribution differs.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast(DEC).alias("qty")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, part, on_skewed="l_partkey", on_small="p_partkey", salt=_SALT)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("qty"), 2).cast("double").alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


_SALTED_JOIN_SQL = """
SELECT p_brand,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


_CENSUS_TOPK = 10


def skew_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report — the diagnostic you run BEFORE deciding
    to salt: per join/agg key (here ``l_suppkey``), the top
    ``_CENSUS_TOPK`` heaviest keys with their row share and cumulative
    share in basis points, plus the global key count. A top key holding
    >1/parallelism of the rows is the straggler signature that
    [[skew_salted_agg]]/[[skew_salted_join]] exist to fix.

    Scale: one combinable count aggregate to |keys| rows, then the top-k
    via ``orderBy().limit()`` — TakeOrderedAndProject, a per-partition
    heap + driver merge of k rows, NOT a global sort — and the rank /
    cumulative window runs on k rows only. The totals row is a 1-row
    broadcast scalar. |keys| never funnels through one partition.
    """
    li = table(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    topk = counts.orderBy(F.col("n").desc(), "l_suppkey").limit(_CENSUS_TOPK)
    w = Window.orderBy(F.col("n").desc(), "l_suppkey")
    return (
        topk.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).alias("rnk"),
            "l_suppkey",
            "n",
            F.expr("n * 10000 div total_rows").alias("share_bps"),
            F.expr("sum(n) over (order by n desc, l_suppkey"
                   " rows unbounded preceding) * 10000 div total_rows"
                   ).alias("cum_share_bps"),
            "n_keys",
        )
        .orderBy("rnk")
    )


_SKEW_KEY_CENSUS_SQL = f"""
WITH counts AS (
    SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
),
totals AS (
    SELECT CAST(SUM(n) AS BIGINT) AS total_rows, COUNT(*) AS n_keys
    FROM counts
),
topk AS (
    SELECT l_suppkey, n FROM counts
    ORDER BY n DESC, l_suppkey LIMIT {_CENSUS_TOPK}
)
SELECT ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey) AS rnk,
       l_suppkey, n,
       CAST(n * 10000 // total_rows AS BIGINT) AS share_bps,
       CAST(SUM(n) OVER (ORDER BY n DESC, l_suppkey
                         ROWS UNBOUNDED PRECEDING) * 10000 // total_rows
            AS BIGINT) AS cum_share_bps,
       n_keys
FROM topk CROSS JOIN totals
ORDER BY rnk
"""


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
    "skew_key_census": skew_key_census,
}
ORACLES = {
    "skew_salted_agg": _SALTED_AGG_SQL,
    "skew_salted_join": _SALTED_JOIN_SQL,
    "skew_key_census": _SKEW_KEY_CENSUS_SQL,
}
