"""Round-4 advice regressions: mvhd parsing on real ISO-BMFF layout,
and k-core peeling to a true fixpoint."""

import struct

from pyspark.sql import functions as F

from waterbear_spark.functions.multimodal import mp4_box_walk
from waterbear_spark.queries.graph import peel_kcore


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    payload = (
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">I", 11111)  # creation
        + struct.pack(">I", 22222)  # modification
        + struct.pack(">I", timescale)
        + struct.pack(">I", duration)
        + b"\x00" * 80  # rate/volume/reserved/matrix/predefined/next_id
    )
    return _box(b"mvhd", payload)


def _mvhd_v1(timescale: int, duration: int) -> bytes:
    payload = (
        b"\x01\x00\x00\x00"  # version 1 + flags
        + struct.pack(">Q", 33333)  # creation (u64)
        + struct.pack(">Q", 44444)  # modification (u64)
        + struct.pack(">I", timescale)
        + struct.pack(">Q", duration)  # duration (u64)
        + b"\x00" * 80
    )
    return _box(b"mvhd", payload)


def _mp4(mvhd: bytes, lead_child: bytes = b"") -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0))
    moov = _box(b"moov", lead_child + mvhd)
    mdat = _box(b"mdat", b"\xab" * 10)
    return ftyp + moov + mdat


def test_mp4_walk_parses_real_mvhd_layouts(spark):
    rows = [
        # v0 mvhd, first child of moov
        (0, _mp4(_mvhd_v0(1000, 777))),
        # v1 mvhd: u64 timestamps shift the duration to offset +32
        (1, _mp4(_mvhd_v1(90000, 2**33 + 5))),
        # mvhd NOT the first child: a free box leads — fixed-offset
        # parsing would read garbage, the scan must still find it
        (2, _mp4(_mvhd_v0(600, 42), lead_child=_box(b"free", b"\x00" * 4))),
        # moov with no mvhd within the scan window: NULL, not garbage
        (3, _mp4(_box(b"udta", b"\x00" * 16))),
        # not an MP4 at all
        (4, b"\x89PNG\r\n\x1a\n" + b"\x00" * 24),
    ]
    df = spark.createDataFrame(rows, "id int, data binary")
    got = {r["id"]: r for r in mp4_box_walk(df).collect()}

    assert got[0]["mp4_duration"] == 777
    assert got[0]["mp4_brand"] == "isom"
    assert got[0]["mp4_mdat_bytes"] == 10
    assert got[1]["mp4_duration"] == 2**33 + 5
    assert got[2]["mp4_duration"] == 42
    assert got[3]["mp4_duration"] is None
    assert got[3]["mp4_brand"] == "isom"  # still a well-formed MP4 shell
    assert got[4]["mp4_brand"] is None
    assert got[4]["mp4_duration"] is None


def _sym_edges(spark, pairs):
    und = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src long, dst long")


def test_kcore_peels_long_path_to_empty(spark):
    # a 12-node path needs ~6 peel rounds at k=2; the old fixed-4-round
    # truncation left a non-core remnant (ADVICE round 3)
    path = [(i, i + 1) for i in range(11)]
    out = peel_kcore(_sym_edges(spark, path), 2)
    assert out.count() == 0


def test_kcore_keeps_cycle_drops_tail(spark):
    # 5-cycle (true 2-core) with a 6-edge tail hanging off node 0: the
    # tail peels one node per round — deeper than any fixed round count
    cycle = [(i, (i + 1) % 5) for i in range(5)]
    tail = [(0, 100), (100, 101), (101, 102), (102, 103), (103, 104)]
    out = peel_kcore(_sym_edges(spark, cycle + tail), 2)
    survivors = {r["src"] for r in out.collect()}
    assert survivors == {0, 1, 2, 3, 4}
    # every surviving node has degree >= k IN the surviving subgraph
    degs = out.groupBy("src").count().collect()
    assert all(r["count"] >= 2 for r in degs)
