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


def _file_ranges(path, cols):
    """Per-parquet-file (min, max) footer stats for each column."""
    import pyarrow.parquet as pq

    ranges = {c: [] for c in cols}
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for i in range(grp.num_columns):
                col = grp.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        for c in cols:
            if lo[c] is not None:
                ranges[c].append((lo[c], hi[c]))
    return ranges


def test_zordered_write_tightens_all_dims(spark, tmp_path):
    """Z-order clustering must shrink per-file min/max spans on BOTH
    clustered columns (the data-skipping property), where a linear sort
    only helps its leading column."""
    from waterbear_spark.sources.sinks import write_zordered

    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    cols = ["l_orderkey", "l_partkey"]
    glob = li.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()

    # 16 files = 4 z-bits = 2 bits per dimension -> ~quarter-domain spans
    zpath = str(tmp_path / "li_z")
    write_zordered(li, zpath, cols, num_files=16)
    assert spark.read.parquet(zpath).count() == li.count()

    lpath = str(tmp_path / "li_linear")  # linear sort: first col only
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(lpath)
    )

    def avg_span(path, col):
        spans = _file_ranges(path, cols)[col]
        width = glob[f"mx_{col}"] - glob[f"mn_{col}"]
        return sum((hi - lo) / width for lo, hi in spans) / len(spans)

    # z-order: every dimension's per-file span is a fraction of the domain
    assert avg_span(zpath, "l_orderkey") < 0.5
    assert avg_span(zpath, "l_partkey") < 0.5
    # the linear sort leaves the non-leading column unclustered
    assert avg_span(lpath, "l_partkey") > 0.8


def test_orc_roundtrip_preserves_schema(spark, tmp_path):
    """ORC sink/scan parity: same rows, schema, and pushdown-capable
    format (columnar alternatives matter when interoperating with Hive
    warehouses)."""
    path = str(tmp_path / "orders_orc")
    orders = table(spark, SF_SMOKE, "orders")
    write_partitioned(orders, path, ["o_orderstatus"], fmt="orc")
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    assert {f.name for f in back.schema.fields} == {
        f.name for f in orders.schema.fields
    }
    pruned = back.filter(F.col("o_orderstatus") == "O")
    assert "o_orderstatus=O" in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() > 0


def test_text_source_reads_lines(spark, tmp_path):
    """Whole-line text scan (the raw-corpus ingest path for documents)."""
    path = str(tmp_path / "lines")
    docs = table(spark, SF_SMOKE, "documents").select(
        F.regexp_replace("text", "[\\r\\n]", " ").alias("value")
    )
    docs.write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    assert lines.count() == docs.count()
    assert lines.columns == ["value"]


def test_compact_files(spark, tmp_path):
    """Compaction rewrites a fragmented table into few files, preserving
    rows, without a shuffle (coalesce is narrow)."""
    from waterbear_spark.sources.sinks import compact_files

    path = str(tmp_path / "fragmented")
    li = table(spark, SF_SMOKE, "lineitem")
    li.repartition(64).write.parquet(path)  # 64 tiny files
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 64

    n_files = compact_files(spark, path, target_file_mb=128)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == n_files < 64
    assert spark.read.parquet(path).count() == li.count()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on read: batches written with different column
    sets merge under mergeSchema; missing columns surface as NULLs."""
    path = str(tmp_path / "evolving")
    orders = table(spark, SF_SMOKE, "orders")
    orders.select("o_orderkey", "o_totalprice").write.parquet(path)
    orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "o_orderpriority"}
    assert merged.count() == 2 * orders.count()
    # rows from the first batch carry NULL for the new column
    assert merged.filter(F.col("o_orderpriority").isNull()).count() == orders.count()


def test_entity_datasource_reads_partitioned_synthetic(spark):
    """Custom Python DataSource: entity records planned as a partitioned
    scan with the compiled schema; deterministic under a fixed seed."""
    import os as _os

    from waterbear_spark.sources.entity_source import EntityDataSource

    spark.dataSource.register(EntityDataSource)
    model_dir = _os.path.join(
        _os.path.dirname(__file__), "fixtures", "model"
    )
    reader = (
        spark.read.format("waterbear_entity")
        .option("model_dir", model_dir)
        .option("entity", "staff")
        .option("n", 250)
        .option("numPartitions", 4)
        .option("seed", 7)
    )
    df = reader.load()
    assert df.count() == 250
    assert df.rdd.getNumPartitions() == 4
    # schema is the compiled entity schema (nested contact struct)
    assert "contact" in df.columns
    # deterministic: same options -> same data
    a = sorted(r["id"] for r in df.select("id").collect())
    b = sorted(r["id"] for r in reader.load().select("id").collect())
    assert a == b


def test_sorted_runs_are_ordered_within_files(spark, tmp_path):
    """Secondary-sort export: every output file holds each user's events
    contiguously, ordered by timestamp."""
    import pyarrow.parquet as pq

    from waterbear_spark.sources.sinks import write_sorted_runs

    path = str(tmp_path / "runs")
    events = table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id")
    write_sorted_runs(events, path, ["user_id"], ["ts", "event_id"], num_files=4)

    assert spark.read.parquet(path).count() == events.count()
    seen_users = set()
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(path, fname)).to_pydict()
        rows = list(zip(t["user_id"], t["ts"], t["event_id"]))
        assert rows == sorted(rows), f"{fname} not in (user, ts, id) order"
        # each user appears in exactly one file
        users = set(t["user_id"])
        assert not (users & seen_users)
        seen_users |= users


def test_xml_roundtrip_preserves_rows(spark, tmp_path):
    """XML sink/scan round-trip (built-in since Spark 4): nation written
    as <row> elements and read back with an explicit rowTag — the ingest
    path for XML feeds without external packages."""
    path = str(tmp_path / "nation_xml")
    nation = table(spark, SF_SMOKE, "nation")
    nation.write.format("xml").option("rowTag", "row").save(path)
    back = spark.read.format("xml").option("rowTag", "row").load(path)
    assert back.count() == nation.count()
    assert {f.name for f in back.schema.fields} == {
        f.name for f in nation.schema.fields
    }
    got = {r["n_nationkey"]: r["n_name"] for r in back.collect()}
    want = {r["n_nationkey"]: r["n_name"] for r in nation.collect()}
    assert got == want


def test_entity_datasource_streams_with_replayable_offsets(spark, tmp_path):
    """Streaming Python DataSource (SimpleDataSourceStreamReader): the
    synthetic entity stream delivers rows_per_batch per micro-batch with
    batch-ordinal offsets; max_batches drains it so processAllAvailable
    terminates; seeds are offset-derived so a second run replays the
    exact same rows (checkpoint-recovery safety)."""
    import os as _os

    from waterbear_spark.sources.entity_source import EntityDataSource

    spark.dataSource.register(EntityDataSource)
    model_dir = _os.path.join(_os.path.dirname(__file__), "fixtures", "model")

    def run(name):
        stream = (
            spark.readStream.format("waterbear_entity")
            .option("model_dir", model_dir)
            .option("entity", "staff")
            .option("rows_per_batch", 40)
            .option("max_batches", 3)
            .option("seed", 11)
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(f"SELECT id FROM {name}").collect()

    first = sorted(r["id"] for r in run("entity_stream_a"))
    assert len(first) == 120
    second = sorted(r["id"] for r in run("entity_stream_b"))
    assert first == second


def test_delete_where(spark, tmp_path):
    from waterbear_spark.sources.sinks import delete_where

    target = str(tmp_path / "gdpr")
    spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(100)], "id long, owner string"
    ).write.parquet(target)

    n = delete_where(spark, target, "owner = 'u1'")
    assert n == 33
    left = spark.read.parquet(target)
    assert left.count() == 67
    assert left.filter("owner = 'u1'").count() == 0
    # deleting nothing is a no-op (no rewrite)
    import os

    mtime = max(
        os.path.getmtime(os.path.join(target, f)) for f in os.listdir(target)
    )
    assert delete_where(spark, target, "owner = 'zzz'") == 0
    assert (
        max(
            os.path.getmtime(os.path.join(target, f))
            for f in os.listdir(target)
        )
        == mtime
    )


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    # SQL DELETE semantics: a NULL predicate ('v > 5' with NULL v) is
    # not TRUE, so the row must survive the delete — not vanish from
    # both the kept side and the deleted count
    from waterbear_spark.sources.sinks import delete_where

    target = str(tmp_path / "null_gdpr")
    spark.createDataFrame(
        [(1, 10), (2, None), (3, 3)], "id long, v int"
    ).write.parquet(target)

    n = delete_where(spark, target, "v > 5")
    assert n == 1
    left = spark.read.parquet(target)
    assert {r["id"] for r in left.collect()} == {2, 3}
    assert left.filter("v IS NULL").count() == 1


def test_overwrite_partitions_touches_only_written_days(spark, tmp_path):
    import os

    from waterbear_spark.sources.sinks import overwrite_partitions

    target = str(tmp_path / "daily")
    spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}") for i in range(90)], "id long, day string"
    ).write.partitionBy("day").parquet(target)
    untouched = os.path.join(target, "day=2024-01-01")
    before = sorted(os.listdir(untouched))

    # re-derive ONLY day 3 with different rows
    redo = spark.createDataFrame(
        [(1000 + i, "2024-01-03") for i in range(5)], "id long, day string"
    )
    overwrite_partitions(redo, target, ["day"])

    got = spark.read.parquet(target)
    assert got.filter("day = '2024-01-03'").count() == 5
    assert got.filter("day = '2024-01-01'").count() == 30
    assert got.filter("day = '2024-01-02'").count() == 30
    # day 1's files were not rewritten
    assert sorted(os.listdir(untouched)) == before


def test_delete_where_preserves_partition_layout(spark, tmp_path):
    import os

    from waterbear_spark.sources.sinks import delete_where

    target = str(tmp_path / "part_gdpr")
    spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(40)], "id long, day string"
    ).write.partitionBy("day").parquet(target)

    n = delete_where(spark, target, "id < 4", partition_cols=["day"])
    assert n == 4
    dirs = {d for d in os.listdir(target) if d.startswith("day=")}
    assert dirs == {"day=d0", "day=d1"}
    got = spark.read.parquet(target)
    assert got.count() == 36
    # partition pruning still works on the rewritten table
    assert got.filter("day = 'd0'").count() == 18
