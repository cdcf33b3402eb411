"""Unit tests for custom operators (as-of join, top-k per group)."""

import datetime

from pyspark.sql import functions as F

from waterbear_spark.operators import asof_join, top_k_per_group
import pytest

pytestmark = pytest.mark.smoke  # <10-min certification subset


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_ties(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), "t1"),
            (1, _ts("2024-01-01T10:00:00"), "t0-exact"),
            (1, _ts("2024-01-01T09:59:59"), "t-before"),
            (2, _ts("2024-01-01T10:00:10"), "other-key"),
            (3, _ts("2024-01-01T10:00:10"), "no-quotes"),
        ],
        "key int, t timestamp, label string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, 9.99),
            (1, _ts("2024-01-01T10:00:00"), 101, 10.01),  # same-time tie
            (1, _ts("2024-01-01T10:00:04"), 102, 10.05),
            (2, _ts("2024-01-01T10:00:01"), 200, 20.0),
        ],
        "key int, qt timestamp, quote_id int, price double",
    )
    out = asof_join(
        trades,
        quotes,
        on_left="key",
        on_right="key",
        left_time="t",
        right_time="qt",
        value_cols=["quote_id", "price"],
        tiebreak="quote_id",
    )
    got = {r["label"]: (r["quote_id"], r["price"]) for r in out.collect()}
    assert got["t1"] == (102, 10.05)          # latest prior quote
    assert got["t0-exact"] == (101, 10.01)    # inclusive match, max tiebreak wins
    assert got["t-before"] == (None, None)    # nothing prior
    assert got["other-key"] == (200, 20.0)    # keys don't leak
    assert got["no-quotes"] == (None, None)   # key with no right rows


def test_asof_join_tolerance(spark):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:10"), "recent"),
         (1, _ts("2024-01-01T12:00:00"), "stale")],
        "key int, t timestamp, label string",
    )
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100, 9.99)],
        "key int, qt timestamp, quote_id int, price double",
    )
    out = asof_join(
        trades, quotes, on_left="key",
        left_time="t", right_time="qt",
        value_cols=["quote_id", "price"], tiebreak="quote_id",
        tolerance="1 minute",
    )
    got = {r["label"]: r["quote_id"] for r in out.collect()}
    assert got["recent"] == 100      # 10s old quote: within tolerance
    assert got["stale"] is None      # 2h old quote: too stale, nulled


def test_asof_join_single_shuffle_no_blowup(spark):
    # the physical plan must contain exactly one shuffle on the key
    # (union-timeline), not a join-then-filter cartesian blowup
    left = spark.range(100).select(
        (F.col("id") % 5).cast("int").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("t"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).cast("int").alias("k"),
        F.timestamp_seconds(F.col("id") * 97).alias("rt"),
        F.col("id").alias("right_id"),
    )
    out = asof_join(
        left, right, on_left="k", left_time="t", right_time="rt",
        value_cols=["right_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all: union + window
    assert out.count() == 100


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "grp string, id int, score double",
    )
    out = top_k_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id")], k=2
    )
    got = {(r["grp"], r["rank"]): r["id"] for r in out.collect()}
    assert got == {("a", 1): 2, ("a", 2): 3, ("b", 1): 4}


class TestFindIslands:
    """Stitched gaps-and-islands: crafted runs crossing 1, 2, and 3+
    block edges must merge exactly; interior runs pass through."""

    def test_runs_spanning_blocks_merge(self, spark):
        from waterbear_spark.operators.islands import find_islands

        b = 100
        runs = [
            (5, 9),          # interior
            (95, 104),       # crosses one edge (block 0 -> 1)
            (180, 461),      # spans blocks 1..4 (3 edges, full blocks 2-3)
            (600, 600),      # singleton interior
            (699, 700),      # exactly at an edge (end of 6, start of 7)
        ]
        keys = [k for lo, hi in runs for k in range(lo, hi + 1)]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        got = sorted(
            tuple(r)
            for r in find_islands(df, "key", block=b).collect()
        )
        want = sorted((lo, hi, hi - lo + 1) for lo, hi in runs)
        assert got == want

    def test_adjacent_blocks_without_adjacency_stay_split(self, spark):
        from waterbear_spark.operators.islands import find_islands

        b = 100
        # 98..99 touches the upper edge, 101..102 starts past the lower
        # edge: a gap at 100 must keep them separate islands
        df = spark.createDataFrame([(98,), (99,), (101,), (102,)], ["key"])
        got = sorted(tuple(r) for r in find_islands(df, "key", block=b).collect())
        assert got == [(98, 99, 2), (101, 102, 2)]

    def test_negative_keys_use_floor_blocks(self, spark):
        from waterbear_spark.operators.islands import find_islands

        b = 100
        # runs straddling zero and negative block edges: truncating `div`
        # would put -100..-1 in block 0 alongside 0..99 yet misalign the
        # edge tests, splitting these runs permanently
        runs = [(-205, -196), (-101, -98), (-2, 3), (-450, -449)]
        keys = [k for lo, hi in runs for k in range(lo, hi + 1)]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        got = sorted(tuple(r) for r in find_islands(df, "key", block=b).collect())
        want = sorted((lo, hi, hi - lo + 1) for lo, hi in runs)
        assert got == want

class TestBucketedNtile:
    def test_matches_plain_ntile_all_shapes(self, spark):
        """bucketed_ntile == NTILE for global and partitioned tilings,
        k dividing and not dividing n, including the n < k zero-size-tile
        numbering."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from waterbear_spark.operators.ntile import bucketed_ntile

        df = spark.range(997).select(
            (F.col("id") % 7).alias("p"),
            F.expr(
                "CAST(conv(substr(md5(cast(id as string)),1,8),16,10) % 1000"
                " AS DOUBLE)"
            ).alias("v"),
            F.col("id").alias("k"),
        )
        cases = [([], 10), (["p"], 10), ([], 16), (["p"], 3)]
        for parts, k in cases:
            got = bucketed_ntile(df, "v", "k", k, part_cols=parts, width=50.0)
            w = Window.partitionBy(*parts).orderBy("v", "k")
            exp = df.withColumn("tile", F.ntile(k).over(w))
            diff = (
                got.select("p", "v", "k", "tile")
                .exceptAll(exp.select("p", "v", "k", "tile"))
                .count()
            )
            assert diff == 0, (parts, k)

    def test_tiny_input_skips_tiles_like_ntile(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from waterbear_spark.operators.ntile import bucketed_ntile

        df = spark.createDataFrame(
            [(1.0, 1), (5.0, 2), (5.0, 3), (9.0, 4)], "v double, k long"
        )
        got = bucketed_ntile(df, "v", "k", 10, width=4.0)
        exp = df.withColumn("tile", F.ntile(10).over(Window.orderBy("v", "k")))
        assert (
            got.select("v", "k", "tile")
            .exceptAll(exp.select("v", "k", "tile"))
            .count()
            == 0
        )

