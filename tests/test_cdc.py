"""foreachBatch CDC upsert: change stream merged into a parquet table."""

from pyspark.sql import functions as F

from waterbear_spark.streaming.cdc import stream_merge_into


def test_stream_merge_into(spark, tmp_path):
    target = str(tmp_path / "accounts")
    spark.createDataFrame(
        [(1, "alice", 10.0, 0), (2, "bob", 20.0, 0)],
        "id long, name string, bal double, ver long",
    ).write.parquet(target)

    # two change files -> two micro-batches; id=2 updated twice (ver 1
    # then 2 in the same batch -> dedupe keeps ver 2), id=3 inserted
    changes_dir = str(tmp_path / "changes")
    spark.createDataFrame(
        [(2, "bob", 50.0, 1), (2, "bob", 99.0, 2), (3, "carol", 30.0, 1)],
        "id long, name string, bal double, ver long",
    ).coalesce(1).write.mode("overwrite").json(changes_dir)

    stream = spark.readStream.schema("id long, name string, bal double, ver long").json(
        changes_dir
    )
    query = stream_merge_into(
        stream,
        target,
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        dedupe_order_col="ver",
    )
    query.awaitTermination(120)

    got = {
        r["id"]: (r["name"], r["bal"], r["ver"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        1: ("alice", 10.0, 0),   # untouched
        2: ("bob", 99.0, 2),     # latest version wins
        3: ("carol", 30.0, 1),   # inserted
    }
