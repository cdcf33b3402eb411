"""Round-5 advice regressions: mvhd scan skips false-positive hits,
stray files in the exactly-once ledger are ignored, lorenz deciles
drop empty spine rows on degenerate inputs, and the spearman rewrite
keeps the fact table out of any low-cardinality sort window."""

import os
import struct

from pyspark.sql import functions as F

from waterbear_spark.functions.multimodal import mp4_box_walk
from waterbear_spark.queries.relational_more import spearman_price_quantity
from waterbear_spark.queries.wave12 import lorenz_curve_deciles
from waterbear_spark.streaming.exactly_once import (
    idempotent_append,
    read_committed,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    payload = (
        struct.pack(">I", 0)
        + struct.pack(">I", 11111)
        + struct.pack(">I", 22222)
        + struct.pack(">I", timescale)
        + struct.pack(">I", duration)
        + b"\x00" * 80
    )
    return _box(b"mvhd", payload)


def _mp4(children: bytes) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0))
    moov = _box(b"moov", children)
    mdat = _box(b"mdat", b"\xab" * 10)
    return ftyp + moov + mdat


def test_mvhd_scan_skips_false_positive_hits(spark):
    real = _mvhd_v0(1000, 777)
    rows = [
        # byte-aligned decoy: the literal bytes 'mvhd' inside a free
        # box's payload, preceded by zero bytes (size field 0 -> not a
        # plausible box) — the old first-hit parse returned garbage/NULL
        (0, _mp4(_box(b"free", b"\x00\x00\x00\x00mvhd\x00\x00\x00\x00") + real)),
        # nibble-misaligned decoy: hex(06 D7 66 86 40) contains the
        # 'mvhd' hex pattern at an even position — alignment check must
        # reject it and the scan must continue to the real header
        (1, _mp4(_box(b"free", b"\x06\xd7\x66\x86\x40\x00") + real)),
        # both decoys stacked before the real mvhd
        (
            2,
            _mp4(
                _box(b"free", b"\x00\x00mvhd\x00\x00")
                + _box(b"skip", b"\x06\xd7\x66\x86\x40\x00")
                + real
            ),
        ),
        # decoys with NO real mvhd afterwards: NULL, never a garbage read
        (3, _mp4(_box(b"free", b"\x00\x00\x00\x00mvhd" + b"\x00" * 40))),
    ]
    df = spark.createDataFrame(rows, "id int, data binary")
    got = {r["id"]: r for r in mp4_box_walk(df).collect()}
    assert got[0]["mp4_duration"] == 777
    assert got[1]["mp4_duration"] == 777
    assert got[2]["mp4_duration"] == 777
    assert got[3]["mp4_duration"] is None


def test_committed_ledger_ignores_stray_files(spark, tmp_path):
    target = str(tmp_path / "sink")
    b0 = spark.createDataFrame([(1, "a")], "id long, v string")
    b1 = spark.createDataFrame([(2, "b")], "id long, v string")
    assert idempotent_append(b0, 0, target)
    assert idempotent_append(b1, 1, target)
    # a stray artifact in _committed (editor temp file, .DS_Store, ...)
    # must not turn the numeric batch-id sort into a ValueError outage
    committed = os.path.join(target, "_committed")
    for stray in (".hidden", "_tmp_marker", "10.swp"):
        with open(os.path.join(committed, stray), "w") as fh:
            fh.write("x")
    got = read_committed(spark, target)
    assert {r.id for r in got.collect()} == {1, 2}


def test_lorenz_deciles_drop_empty_spine_rows(spark, tmp_path):
    # 3 customers -> only deciles 1, 4, 7 are populated; the explode
    # spine must not surface the other seven as n_cust=0 rows (the
    # oracle's GROUP BY never emits them)
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)],
        "o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf_dir}/orders.parquet")
    out = lorenz_curve_deciles(spark, sf_dir).collect()
    assert [r["decile"] for r in out] == [1, 4, 7]
    assert all(r["n_cust"] == 1 for r in out)
    # cumulative share still reaches 1 despite the dropped spine rows
    assert abs(out[-1]["cum_share"] - 1.0) < 1e-9


def test_spearman_plan_has_no_flag_partitioned_fact_sort(spark):
    # the round-5 rewrite's contract: no window over the fact table
    # partitioned ONLY by l_returnflag (3 keys = parallelism 3); every
    # census window must be sub-partitioned by the value bucket
    df = spearman_price_quantity(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        # a fact-scale window keyed by the flag alone would show the
        # partition spec [l_returnflag#N] followed directly by the
        # ORDER BY column (no __pb sub-bucket)
        assert "__pb" in line or "l_extendedprice" not in line
        assert "__pb" in line or "l_quantity" not in line


def test_anova_exact_at_beyond_double_magnitudes(spark, tmp_path):
    # the sf1 sweep caught engine-divergent double->decimal conversion
    # once group cents^2 sums pass 2^53; this replays the exact-integer
    # path at that magnitude: s1 ~ 3.6e11 cents per group, s1^2 ~ 1.3e23
    from datetime import date

    from waterbear_spark.queries.wave11 import anova_oneway_dow

    sf_dir = str(tmp_path)
    rows = []
    # two dow groups, big prices with a fractional spread so s1^2 % n != 0
    for i in range(3):
        rows.append((date(2024, 1, 1), 1_200_000_007.01 + i))  # Monday
        rows.append((date(2024, 1, 2), 1_199_000_003.57 + 2 * i))  # Tuesday
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(f"{sf_dir}/orders.parquet")

    groups = {}
    for d, p in rows:
        groups.setdefault(d, []).append(round(p * 100))
    k, n = len(groups), len(rows)
    ssq = sum(sum(v) ** 2 // len(v) for v in groups.values())  # exact floor
    g1 = sum(sum(v) for v in groups.values())
    g2 = sum(x * x for v in groups.values() for x in v)
    # the engine keeps both SS as exact integer differences until the
    # final double conversion — no cancellation even when the within
    # signal (1e5 cents^2) sits far below the moments' double ulp (1e7)
    ss_between = float(ssq - g1 * g1 // n) / 1e4
    ss_within = float(g2 - ssq) / 1e4

    got = anova_oneway_dow(spark, sf_dir).collect()[0]
    assert got.n_groups == k and got.n == n
    assert got.ss_between == ss_between
    assert got.ss_within == ss_within
    assert got.ss_within > 0  # the cancellation regression zeroed this


def test_target_encoding_never_emits_negative_zero(spark):
    # a tiny negative shrinkage rounds to zero; DuckDB keeps the sign
    # bit, Spark does not — the query normalizes with + 0.0 so both
    # engines (and the driver's repr-based value hash) agree
    from waterbear_spark.queries.wave5 import target_encoding
    from waterbear_spark.testing import norm_cell

    rows = target_encoding(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        for v in r:
            assert norm_cell(v) != "-0.0"
    # and the normalization expression itself: -0.0 + 0.0 == +0.0
    import math

    out = spark.sql("SELECT round(-1e-9, 6) + 0.0 AS z").collect()[0]["z"]
    assert out == 0.0 and not math.copysign(1.0, out) < 0
