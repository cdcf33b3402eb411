"""Exactly-once append sink: re-delivered micro-batches are no-ops, and
half-written (uncommitted) batches are invisible to readers."""

import os
import shutil

import pytest

from waterbear_spark.streaming.exactly_once import (
    idempotent_append,
    read_committed,
)

pytestmark = pytest.mark.smoke  # <10-min certification subset


def test_redelivered_batch_is_a_noop(spark, tmp_path):
    target = str(tmp_path / "sink")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")

    assert idempotent_append(b0, 0, target) is True
    assert idempotent_append(b1, 1, target) is True
    # driver restart between sink write and checkpoint commit: batch 1
    # is delivered again — must not duplicate
    assert idempotent_append(b1, 1, target) is False

    got = read_committed(spark, target)
    assert got.count() == 3
    assert {r.id for r in got.collect()} == {1, 2, 3}
    # partition column is recoverable for per-batch compaction
    assert "batch_id" in got.columns


def test_uncommitted_half_write_is_invisible(spark, tmp_path):
    target = str(tmp_path / "sink")
    b0 = spark.createDataFrame([(1, "a")], "id long, v string")
    b1 = spark.createDataFrame([(2, "b")], "id long, v string")
    assert idempotent_append(b0, 0, target)
    assert idempotent_append(b1, 1, target)
    # simulate a crash AFTER the data write but BEFORE the marker: remove
    # the marker, keep the directory
    os.remove(os.path.join(target, "_committed", "1"))
    got = read_committed(spark, target)
    assert {r.id for r in got.collect()} == {1}
    # the retry then re-writes the same directory and commits it
    assert idempotent_append(b1, 1, target) is True
    assert {r.id for r in read_committed(spark, target).collect()} == {1, 2}


def test_batch_ids_sort_numerically_and_empty_ledger_is_typed(spark, tmp_path):
    import pytest

    target = str(tmp_path / "sink")
    # empty ledger: typed return with schema, hard error without
    empty = read_committed(spark, target, schema="id long, v string")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v", "batch_id"]
    with pytest.raises(FileNotFoundError):
        read_committed(spark, target)

    # 11 batches: lexicographic id order would read 0,1,10,2,... — the
    # committed frame must carry ids 0..10 and union cleanly with the
    # pre-commit empty frame (same schema)
    for bid in range(11):
        b = spark.createDataFrame([(bid, "x")], "id long, v string")
        assert idempotent_append(b, bid, target) is True
    got = read_committed(spark, target)
    assert sorted(r["batch_id"] for r in got.collect()) == list(range(11))
    assert empty.unionByName(got).count() == 11


def test_streaming_foreachbatch_integration(spark, tmp_path):
    """Drive it through a real writeStream.foreachBatch, then re-run the
    same batches manually to prove replay safety end to end."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "sink")
    spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
    ).coalesce(1).write.json(src)

    seen = []

    def sink(batch, batch_id):
        seen.append(batch_id)
        idempotent_append(batch, batch_id, target)

    q = (
        spark.readStream.schema("id long, v string")
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen
    n = read_committed(spark, target).count()
    assert n == 3
    # replay every delivered batch id with fabricated duplicates
    dup = spark.createDataFrame([(9, "dup")], "id long, v string")
    for bid in seen:
        assert idempotent_append(dup, bid, target) is False
    assert read_committed(spark, target).count() == n
