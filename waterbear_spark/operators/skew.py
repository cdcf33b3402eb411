"""Skew mitigation: salted joins and two-phase salted aggregation.

At 100 TB a handful of hot keys (the null user, the default account, one
viral document) can put 100x the median load on one shuffle partition and
stall the stage on a single straggler task. Two standard remedies, both
pure DataFrame:

* **salted_join**: explode the hot side's key space by a salt factor and
  replicate the small/dimension side once per salt value. The hot key's
  rows spread over ``salt`` partitions; join semantics are unchanged.
  (AQE's skew-join handles sort-merge cases adaptively; explicit salting
  is for when you know the hot keys or AQE can't split — e.g. aggregation
  state or broadcast-ineligible shapes.)
* **salted_agg**: pre-aggregate on (key, salt) — spreading the hot key —
  then finish on key. Only works for algebraic aggregates (sum/count/
  min/max); the second stage input is |keys| x salt rows, i.e. tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on_skewed: str,
    on_small: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-prone large frame against a (replicable) smaller
    frame, spreading each key over ``salt`` shuffle partitions.

    The small side is exploded ``salt``-fold (cost: |small| x salt rows —
    fine for dimensions, wrong for fact-fact joins; use AQE skew-join
    there). Output columns = skewed's columns + small's columns minus its
    join key (same as a plain equi-join).
    """
    salted_left = skewed.withColumn(
        "__salt", (F.rand(42) * salt).cast("int")
    )
    salted_right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = salted_left.join(
        salted_right,
        (salted_left[on_skewed] == salted_right[on_small])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return joined.drop("__salt").drop(salted_right[on_small])


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps column -> {"sum", "count", "min", "max"} (algebraic
    functions that re-combine); phase 1 aggregates on (key, salt), phase
    2 combines per key. Output column names: ``<fn>_<col>``.
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in combine:
            raise ValueError(f"{fn} is not algebraic; salting would be wrong")

    phase1 = (
        df.withColumn("__salt", (F.rand(42) * salt).cast("int"))
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                first[fn](F.col(col)).alias(f"__p_{fn}_{col}")
                for col, fn in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            combine[fn](F.col(f"__p_{fn}_{col}")).alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
