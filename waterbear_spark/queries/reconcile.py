"""Data reconciliation: table diff (added/removed/changed/unchanged) and
an order-insensitive table checksum — the two primitives that let a
100 TB pipeline prove a migration, backfill, or replication preserved its
data without ever collecting a table.

The "new version" in the diff query is a deterministic in-query
perturbation of ``orders`` (modulo-keyed deletes, price updates, and key-
shifted inserts), so the expected class counts are engine-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.operators.diff import CHANGE_COL, table_diff
from waterbear_spark.queries.tables import table

_DEL_MOD = 97  # keys to delete in the simulated new version
_UPD_MOD = 89  # keys whose price is bumped
_INS_MOD = 101  # keys cloned as inserts (shifted key space)
_KEY_SHIFT = 1_000_000_000


def _new_version(orders: DataFrame) -> DataFrame:
    kept = orders.filter(F.col("o_orderkey") % _DEL_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _UPD_MOD == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = orders.filter(F.col("o_orderkey") % _INS_MOD == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + _KEY_SHIFT
    )
    return kept.unionByName(inserted)


def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff a deterministically perturbed ``orders`` against the original
    (one full outer join on the key — see ``operators/diff.py``) and
    count rows per change class.

    Scale: the classification is join-local; the final count shuffles 4
    rows. On bucketed tables the key join is exchange-free.
    """
    orders = table(spark, sf_dir, "orders")
    d = table_diff(
        orders,
        _new_version(orders),
        keys=["o_orderkey"],
        compare=["o_totalprice", "o_orderstatus"],
    )
    return (
        d.groupBy(CHANGE_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(CHANGE_COL)
    )


TABLE_DIFF_SQL = f"""
WITH new_version AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {_UPD_MOD} = 0
                THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0
    UNION ALL
    SELECT o_orderkey + {_KEY_SHIFT}, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % {_INS_MOD} = 0
),
classified AS (
    SELECT CASE
             WHEN o.o_orderkey IS NULL THEN 'added'
             WHEN n.o_orderkey IS NULL THEN 'removed'
             WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
              AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                THEN 'unchanged'
             ELSE 'changed'
           END AS {CHANGE_COL}
    FROM orders o FULL OUTER JOIN new_version n
      ON o.o_orderkey = n.o_orderkey
)
SELECT {CHANGE_COL}, COUNT(*) AS n
FROM classified
GROUP BY {CHANGE_COL}
ORDER BY {CHANGE_COL}
"""


def checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: md5 each canonical row string
    (floats normalized through DECIMAL so the text is engine-portable),
    take the top 60 bits as an integer, and sum exactly as DECIMAL(38,0)
    alongside the row count.

    Scale: fully map-side (hash per row, partial sums) with a single-row
    result — the cheapest possible full-table integrity probe, and the
    same trick the oracle harness itself uses for frame comparison.
    """
    orders = table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_totalprice").cast("decimal(20,2)"),
        F.to_date("o_orderdate"),
        F.col("o_orderstatus"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("decimal(38,0)")
    # surfaced as a string: DECIMAL(38,0) collects as Decimal/float128
    # inconsistently across client paths, while the digit string is exact
    # and identical in both engines
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
    )


CHECKSUM_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(CAST(CAST('0x' || substr(md5(
           o_orderkey || '|' || o_custkey || '|'
           || CAST(o_totalprice AS DECIMAL(20,2)) || '|'
           || CAST(o_orderdate AS DATE) || '|' || o_orderstatus
       ), 1, 15) AS UBIGINT) AS BIGINT) AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM orders
"""


def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-status (COUNT, SUM(price))
    aggregate is NOT recomputed after a change batch — the old aggregate
    absorbs signed delta contributions (delete -> (-price, -1), update ->
    (-old, +new), insert -> (+price, +1)), the algebra every
    materialized-view maintainer runs. The oracle recomputes the
    aggregate from the perturbed table directly, so the hash-match is a
    proof that maintained == recomputed.

    Scale: the delta is proportional to the CHANGE batch, not the table —
    at 100 TB the recompute touches everything while this touches the
    old aggregate (|groups| rows) plus the day's CDC; sums stay DECIMAL
    so absorption is exact regardless of delta order.
    """
    orders = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(20,6)")
    base = orders.groupBy("o_orderstatus").agg(
        F.sum(price).alias("s"), F.count(F.lit(1)).alias("n")
    )

    deleted = orders.filter(F.col("o_orderkey") % _DEL_MOD == 0).select(
        "o_orderstatus", (-price).alias("ds"), F.lit(-1).alias("dn")
    )
    # updates only apply to rows that survive the delete
    updated = orders.filter(
        (F.col("o_orderkey") % _UPD_MOD == 0)
        & (F.col("o_orderkey") % _DEL_MOD != 0)
    ).select(
        "o_orderstatus",
        F.lit(10.0).cast("decimal(20,6)").alias("ds"),
        F.lit(0).alias("dn"),
    )
    inserted = orders.filter(F.col("o_orderkey") % _INS_MOD == 0).select(
        "o_orderstatus", price.alias("ds"), F.lit(1).alias("dn")
    )
    delta = (
        deleted.unionByName(updated)
        .unionByName(inserted)
        .groupBy("o_orderstatus")
        .agg(F.sum("ds").alias("ds"), F.sum("dn").alias("dn"))
    )
    return (
        base.join(delta, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            F.round(
                F.col("s") + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(20,6)")), 2
            )
            .cast("double")
            .alias("sum_price"),
            (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


IVM_SQL = f"""
WITH new_version AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {_UPD_MOD} = 0
                THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0
    UNION ALL
    SELECT o_orderkey + {_KEY_SHIFT}, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % {_INS_MOD} = 0
)
SELECT o_orderstatus,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS sum_price,
       COUNT(*) AS n_orders
FROM new_version
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "table_diff_orders": table_diff_orders,
    "checksum_orders": checksum_orders,
    "ivm_incremental_agg": ivm_incremental_agg,
}
ORACLES = {
    "table_diff_orders": TABLE_DIFF_SQL,
    "checksum_orders": CHECKSUM_SQL,
    "ivm_incremental_agg": IVM_SQL,
}
