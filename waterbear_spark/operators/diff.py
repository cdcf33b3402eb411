"""Generic table diff: given two versions of a table and a key, classify
every row as added / removed / changed / unchanged.

The engine-native reconciliation primitive (what Delta's CDF or a
data-diff tool produces) expressed as one full outer join on the key —
no collect, no per-row Python. Value comparison is a null-safe struct
equality, so NULL column values compare correctly and adding a compare
column never changes join shape.

Scale: one shuffle per side on the key (or zero if both sides are
bucketed on it — see ``sources/sinks.write_bucketed``); the join output
streams straight into whatever aggregate or sink follows. Skewed keys
follow the same salting recipe as ``operators/skew.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Full-outer diff of ``new`` against ``old`` on ``keys``; returns the
    key columns, a ``change_type`` column (added/removed/changed/
    unchanged), and the old/new value structs for downstream inspection.
    """
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c) for c in compare]).alias("old_vals"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c) for c in compare]).alias("new_vals"),
    )
    joined = o.join(n, on=list(keys), how="full_outer")
    return joined.select(
        *keys,
        F.when(F.col("old_vals").isNull(), F.lit("added"))
        .when(F.col("new_vals").isNull(), F.lit("removed"))
        .when(
            F.col("old_vals").eqNullSafe(F.col("new_vals")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
        .alias(CHANGE_COL),
        "old_vals",
        "new_vals",
    )
