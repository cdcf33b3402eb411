"""As-of (nearest-prior) join — a composition of built-in operators.

Spark has no AS OF join operator (SURVEY.md §2b row "as-of join"). The
naive implementation — inequality join then argmax per left row — builds an
|left_row x matching_right_rows| intermediate, which explodes at scale and
degenerates to a broadcast-nested-loop join. This implementation uses the
**union-timeline** pattern instead:

1. union right-side "state" rows and left-side "probe" rows into a single
   timeline, tagged by origin;
2. one shuffle on the join key, one sort per partition on
   (time, origin, tiebreak);
3. carry the last-seen right row forward with ``last(..., ignorenulls=True)``
   over an unbounded-preceding window;
4. keep the probe rows.

Cost at 100 TB: exactly one shuffle of |left| + |right| rows keyed by the
join key — the same lower bound as a sort-merge join — with no pairwise
blowup and no nested-loop fallback. Skewed keys can be salted upstream.

Tie semantics: a right row at exactly t = left.t matches (inclusive), and
among right rows with equal time the one with the greatest tiebreak column
wins, which gives deterministic output for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str | None = None,
    *,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` for the same join key (``backward``,
    the default), or the earliest right row with ``right_time >=
    left_time`` (``forward`` — the "next quote" shape). Forward mode is
    the same union-timeline plan traversed in reverse: identical cost,
    one shuffle, no pairwise blowup.

    :param on_left: equi-join key column in the left (probe) frame.
    :param on_right: equi-join key column in the right (state) frame;
        defaults to ``on_left``.
    :param left_time: event-time column of the probe side.
    :param right_time: event-time column of the state side.
    :param value_cols: right-side columns carried onto the probe rows
        (returned as-is; NULL when no prior right row exists).
    :param tiebreak: right-side column breaking equal-time ties
        (greatest wins); defaults to the first value column.
    :param tolerance: optional max lookback (backward) / lookahead
        (forward) as an INTERVAL string (e.g. ``"7 days"``): a match
        further than that from ``left_time`` is discarded (NULLed),
        mirroring pandas ``merge_asof(tolerance=...)``.
    :param direction: ``"backward"`` (nearest prior, inclusive) or
        ``"forward"`` (nearest following, inclusive).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on_right = on_right or on_left
    tiebreak = tiebreak or value_cols[0]

    # the carried state includes the right event time (__rt) so an
    # optional tolerance can invalidate matches that are too old
    state_fields = [f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols]
    state_fields.append(f"__rt:{right.schema[right_time].dataType.simpleString()}")
    probe = left.select(
        F.col(on_left).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__origin"),  # probes sort after state rows at equal t
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None)
        .cast("struct<" + ",".join(state_fields) + ">")
        .alias("__state"),
    )
    state = right.select(
        F.col(on_right).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__origin"),
        F.col(tiebreak).alias("__tie"),
        F.lit(None).cast(probe.schema["__left"].dataType).alias("__left"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_time).alias("__rt"),
        ).alias("__state"),
    )

    timeline = state.unionByName(probe)
    # forward mode traverses the timeline in reverse: descending time,
    # probes still AFTER the state rows they may match (equal-time rows
    # match inclusively in both directions), and among equal-time state
    # rows the greatest tiebreak still lands nearest the probe
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    carry = (
        Window.partitionBy("__key")
        .orderBy(t_order, F.col("__origin"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = timeline.withColumn(
        "__asof", F.last("__state", ignorenulls=True).over(carry)
    )

    if tolerance:
        if direction == "backward":
            fresh = F.col("__asof.__rt") >= F.col("__t") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            fresh = F.col("__asof.__rt") <= F.col("__t") + F.expr(
                f"INTERVAL {tolerance}"
            )
        carried = [
            F.when(fresh, F.col(f"__asof.{c}")).alias(c) for c in value_cols
        ]
    else:
        carried = [F.col(f"__asof.{c}").alias(c) for c in value_cols]

    result = matched.filter(F.col("__origin") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *carried,
    )
    return result
