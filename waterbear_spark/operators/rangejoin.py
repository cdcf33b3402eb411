"""Bucketized range join: point-in-interval matching without a nested
loop.

A naive ``points JOIN ranges ON p BETWEEN start AND end`` has no equi key,
so Spark plans a BroadcastNestedLoopJoin — O(|points| x |ranges|) compares
and a broadcast requirement. The standard scale pattern bins both sides by
a bucket width:

* each point joins on its bucket id;
* each range explodes to the buckets it overlaps (``sequence`` of ids —
  cheap when ranges are at most a few buckets wide);
* the bucket equi-join shuffles on an integer key, then the exact
  ``[start, end)`` predicate filters within the bucket.

Each (point, range) match is produced exactly once — by the point's own
bucket — so no dedup pass is needed. Pick ``bucket_width`` close to the
typical range span: wider wastes filter work, narrower multiplies the
range-side explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int,
) -> DataFrame:
    """Inner-join each point row to every range row with
    ``start <= point < end`` via bucket equi-join (timestamp columns).

    Returns points' columns + ranges' columns.
    """
    w = F.lit(bucket_width_seconds)
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(point_col)) / w).cast("long")
    )
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    joined = p.join(r, "__bucket").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket")
