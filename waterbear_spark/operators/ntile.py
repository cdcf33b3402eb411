"""Distributed exact NTILE assignment without a global sort.

``NTILE(k) OVER (ORDER BY v, key)`` forces the whole relation through a
single-partition window — parallelism 1 forever, the "low-cardinality
window trap" this engine systematically rewrites (see SCALE.md). The
tile of a row is fully determined by the k-1 tile-boundary rows, and a
boundary row is an order statistic, so:

1. bucket values by width (``pb = floor(v / width)``), count per bucket,
   and locate which bucket holds each boundary rank with a cumulative
   window over the ~|buckets| relation;
2. sort ONLY the hit buckets (partitioned by bucket id) and pick the
   rows at the boundary ranks by equi-join — the same two-pass order
   statistics as ``equidepth_histogram`` (relational_ext.py);
3. collect the <= k-1 boundary (v, key) pairs into one tiny array per
   tile partition, broadcast it, and assign each row
   ``tile = 1 + #boundaries < (v, key)`` — a row-local comparison.

Exactly NTILE's output (duplicated boundaries from zero-size tiles on
tiny inputs skip tile numbers just like NTILE does); the largest sort is
one value-bucket, and assignment costs one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ntile_bounds(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int,
    part_cols: list[str] | None = None,
    width: float = 64.0,
    bnds_col: str = "__bnds",
) -> DataFrame:
    """The <= k-1 tile-boundary (value, key) pairs per partition as one
    sorted array column ``bnds_col`` (steps 1-3 of the module recipe) —
    split out so callers tiling the SAME relation along several
    independent dimensions (e.g. [[rfm_segments]]' R/F/M quintiles) can
    compute every dimension's boundary relation as parallel subtrees of
    one job and attach all tiles in a single projection, instead of
    nesting whole tilings serially."""
    part_cols = part_cols or []
    p = [F.col(c) for c in part_cols]
    rows = df.withColumn("__pb", F.floor(F.col(value_col) / F.lit(width)))

    cum_w = (
        Window.partitionBy(*p)
        .orderBy("__pb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pbc = (
        rows.groupBy(*p, "__pb")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__cum", F.sum("__cnt").over(cum_w))
        .withColumn("__cum_prev", F.col("__cum") - F.col("__cnt"))
        .withColumn(
            "__n", F.sum("__cnt").over(Window.partitionBy(*p))
        )
    )

    # end-of-tile ranks for tiles 1..k-1 (tile k needs no upper boundary);
    # zero-size tiles on tiny inputs duplicate the previous end rank,
    # which reproduces NTILE's skip-a-tile numbering
    boundary = F.expr(
        f"""
        filter(
          transform(sequence(1, {k - 1}), i -> named_struct(
            'rk', i * (__n div {k}) + least(i, __n % {k}))),
          s -> s.rk > __cum_prev AND s.rk <= __cum)
        """
    )
    targets = pbc.select(
        *p,
        "__pb",
        "__cum_prev",
        F.explode(boundary).alias("__t"),
    ).select(
        *p,
        "__pb",
        (F.col("__t.rk") - F.col("__cum_prev")).alias("__local_rk"),
    )

    rn_w = Window.partitionBy(*p, "__pb").orderBy(value_col, key_col)
    hit_buckets = targets.select(*p, "__pb").distinct()
    ranked = (
        rows.join(F.broadcast(hit_buckets), part_cols + ["__pb"])
        .withColumn("__rn", F.row_number().over(rn_w))
    )
    picked = ranked.join(
        F.broadcast(targets),
        [
            *[ranked[c] == targets[c] for c in part_cols],
            ranked["__pb"] == targets["__pb"],
            ranked["__rn"] == targets["__local_rk"],
        ],
    ).select(
        *[ranked[c] for c in part_cols],
        ranked[value_col].alias("__bv"),
        ranked[key_col].alias("__bk"),
    )

    return picked.groupBy(*p).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__bv"), F.col("__bk")))
        ).alias(bnds_col)
    )


def ntile_tile_expr(bnds_col: str, value_col: str, key_col: str):
    """Row-local tile assignment against a boundary array column:
    ``1 + #boundaries strictly below (value, key)``."""
    v, kcol = F.col(value_col), F.col(key_col)
    return F.lit(1) + F.size(
        F.filter(
            F.col(bnds_col),
            lambda b: (b["__bv"] < v)
            | ((b["__bv"] == v) & (b["__bk"] < kcol)),
        )
    )


def bucketed_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int,
    out_col: str = "tile",
    part_cols: list[str] | None = None,
    width: float = 64.0,
) -> DataFrame:
    """Attach ``out_col`` = NTILE(k) OVER (PARTITION BY part_cols
    ORDER BY value_col, key_col) to ``df``, computed partition-parallel.

    ``key_col`` must make (part, value, key) unique — NTILE over a
    non-unique order is nondeterministic anyway.
    """
    part_cols = part_cols or []
    bounds = ntile_bounds(
        df, value_col, key_col, k, part_cols=part_cols, width=width
    )
    rows = df.withColumn("__pb", F.floor(F.col(value_col) / F.lit(width)))
    if part_cols:
        joined = rows.join(F.broadcast(bounds), part_cols, "left")
    else:
        joined = rows.crossJoin(F.broadcast(bounds))
    # every nonempty partition has >= 1 boundary (tile 1's end rank is
    # always >= 1), so the join never misses
    tile = ntile_tile_expr("__bnds", value_col, key_col)
    return joined.withColumn(out_col, tile).drop("__pb", "__bnds")
