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

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}
ORACLES = {
    "skew_salted_agg": _SALTED_AGG_SQL,
    "skew_salted_join": _SALTED_JOIN_SQL,
}
