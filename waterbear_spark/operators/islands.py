"""Gaps-and-islands over an integer key space, partition-parallel.

The classic ``key - row_number()`` run detector needs a total order; run
it naively and the whole key space sorts in one task. Here detection is
partitioned by fixed-width key-range block, and because a run can only
continue across a BLOCK EDGE, a second pass re-runs the same detector
over just the edge-touching islands (≤2 per block) to merge cross-block
chains. Interior islands are final after pass one.

Used by ``queries.relational_ext.key_islands`` (oracle: the one-window
formulation — the hash-match proves the stitch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_islands(
    keys: DataFrame, key_col: str, block: int = 8192
) -> DataFrame:
    """Contiguous runs of ``key_col`` (must be distinct integers) as
    ``(island_start, island_end, n_keys)``.

    ``block`` bounds the per-task sort; the stitch pass windows over a
    relation ~|keys|/block.
    """
    b = block
    # floor division, not `div` (which truncates toward zero): negative
    # keys must land in correctly-aligned blocks or the edge conditions
    # below misidentify edge-touching islands (e.g. -8192 and -8191 would
    # split across truncated blocks and never stitch). (k - pmod(k, b))
    # is the exact floor multiple for any sign, with no float round-trip.
    keyed = keys.select(F.col(key_col).alias("k")).withColumn(
        "blk", F.expr(f"(k - pmod(k, {b})) div {b}")
    )
    w_blk = Window.partitionBy("blk").orderBy("k")
    islands0 = (
        keyed.withColumn("grp", F.col("k") - F.row_number().over(w_blk))
        .groupBy("blk", "grp")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .withColumn(
            "touches_edge",
            (F.col("island_start") == F.col("blk") * b)
            | (F.col("island_end") == F.col("blk") * b + (b - 1)),
        )
    )
    interior = islands0.filter(~F.col("touches_edge")).select(
        "island_start", "island_end", "n_keys"
    )

    w_edge = Window.orderBy("island_start")
    chained = (
        islands0.filter(F.col("touches_edge"))
        .withColumn(
            "new_chain",
            F.when(
                F.col("island_start") > F.lag("island_end").over(w_edge) + 1,
                1,
            )
            .when(F.lag("island_end").over(w_edge).isNull(), 1)
            .otherwise(0),
        )
        .withColumn(
            "chain",
            F.sum("new_chain").over(
                w_edge.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("chain")
        .agg(
            F.min("island_start").alias("island_start"),
            F.max("island_end").alias("island_end"),
            F.sum("n_keys").alias("n_keys"),
        )
        .select("island_start", "island_end", "n_keys")
    )
    return interior.unionAll(chained)
