"""Sink tests: partitioned writes, bucketed zero-shuffle joins, merge
upsert, SCD2 history."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table
from waterbear_spark.sources.sinks import (
    merge_upsert,
    scd2_apply,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = table(spark, SF_SMOKE, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_partitioned(orders, path, ["status"])
    assert sorted(p for p in os.listdir(path) if p.startswith("status=")) == [
        "status=F", "status=O", "status=P",
    ]
    pruned = spark.read.parquet(path).filter(F.col("status") == "O")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status#" in plan or "status=O" in plan
    assert pruned.count() > 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    orders = table(spark, SF_SMOKE, "orders")
    lineitem = table(spark, SF_SMOKE, "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_bkt", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"),
        "lineitem_bkt", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"],
    )
    # at real scale this join is too big to broadcast; force the
    # sort-merge path the bucketing is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the sort-merge join runs with no shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE orders_bkt")
    spark.sql("DROP TABLE lineitem_bkt")


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "cust")
    base = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, bal double"
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "bob", 99.0), (3, "carol", 30.0)], "id long, name string, bal double"
    )
    merged = merge_upsert(spark, path, updates, keys=["id"])
    got = {r["id"]: (r["name"], r["bal"]) for r in merged.collect()}
    assert got == {1: ("alice", 10.0), 2: ("bob", 99.0), 3: ("carol", 30.0)}


def test_scd2(spark, tmp_path):
    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None), (2, "b", "2024-01-01 00:00:00", None)],
        "id long, attr string, _valid_from string, _valid_to string",
    ).select(
        "id", "attr",
        F.col("_valid_from").cast("timestamp").alias("_valid_from"),
        F.col("_valid_to").cast("timestamp").alias("_valid_to"),
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", "2024-06-01 00:00:00")], "id long, attr string, ts string"
    ).select("id", "attr", F.col("ts").cast("timestamp").alias("ts"))

    result = scd2_apply(spark, path, updates, "id", "ts")
    rows = result.orderBy("id", "_valid_from").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    assert len(by_key[1]) == 1 and by_key[1][0]["_valid_to"] is None
    versions = by_key[2]
    assert len(versions) == 2
    closed = [r for r in versions if r["attr"] == "b"][0]
    current = [r for r in versions if r["attr"] == "b2"][0]
    assert closed["_valid_to"] is not None
    assert current["_valid_to"] is None
