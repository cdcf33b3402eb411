"""Structured Streaming tests: file-source stream with enforced schema,
Trigger.AvailableNow, memory sink — results must equal the batch run of
the same transform (the functions are batch/stream polymorphic)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table
from waterbear_spark.streaming import (
    session_metrics,
    stream_dedup,
    stream_stream_join,
    tumbling_metrics,
)
from waterbear_spark.testing import compare_frames


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Events from sf0.001 written as JSON files (a file-source stream)."""
    path = str(tmp_path_factory.mktemp("events_json"))
    # default timestampFormat truncates to millis; keep full micros so
    # session boundaries match the parquet batch exactly
    (
        table(spark, SF_SMOKE, "events")
        .coalesce(4)
        .write.mode("overwrite")
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .json(path)
    )
    return path


def _run_stream(spark, stream_df, name, mode="complete"):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _stream_source(spark, path):
    schema = table(spark, SF_SMOKE, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .json(path)
    )


def test_tumbling_stream_matches_batch(spark, event_stream_dir):
    stream_result = _run_stream(
        spark,
        tumbling_metrics(_stream_source(spark, event_stream_dir), watermark="31 days"),
        "tumbling_test",
    )
    batch_result = tumbling_metrics(table(spark, SF_SMOKE, "events"))
    problems = compare_frames(
        stream_result.columns,
        [tuple(r) for r in stream_result.collect()],
        batch_result.columns,
        [tuple(r) for r in batch_result.collect()],
    )
    assert problems == []
    assert stream_result.count() > 0


def test_sliding_window(spark):
    batch = tumbling_metrics(
        table(spark, SF_SMOKE, "events"), window="2 hours", slide="1 hour"
    )
    rows = batch.collect()
    assert len(rows) > 0
    # every event lands in exactly two 2h/1h sliding windows
    total = sum(r["n_events"] for r in rows)
    assert total == 2 * table(spark, SF_SMOKE, "events").count()


def test_session_stream_matches_batch(spark, event_stream_dir):
    stream_result = _run_stream(
        spark,
        session_metrics(_stream_source(spark, event_stream_dir), gap="5 minutes", watermark="31 days"),
        "session_test",
    )
    batch_result = session_metrics(table(spark, SF_SMOKE, "events"), gap="5 minutes")
    problems = compare_frames(
        stream_result.columns,
        [tuple(r) for r in stream_result.collect()],
        batch_result.columns,
        [tuple(r) for r in batch_result.collect()],
    )
    assert problems == []


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Auto-Loader-style incremental ingest: a restarted stream with the
    same checkpoint processes only files that arrived since the last run
    — no reprocessing, no loss."""
    events = table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = events.filter(F.col("event_id") < 300)
    (
        first.coalesce(3)
        .write.mode("overwrite")
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .json(src)
    )

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
            .json(src)
        )
        query = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 300

    # a new file lands; the resumed stream must pick up ONLY that file
    more = events.filter(F.col("event_id") >= 880)
    n_more = more.count()
    (
        more.coalesce(1)
        .write.mode("append")
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT)
        .json(src)
    )
    run_once()

    result = spark.read.parquet(out)
    assert result.count() == 300 + n_more  # nothing reprocessed
    assert result.select("event_id").distinct().count() == 300 + n_more


def test_stream_stream_join_matches_batch(spark, event_stream_dir):
    """Event-time stream-stream inner join (purchase <- preceding clicks
    attribution) must equal the identical batch join."""
    purchases = _stream_source(spark, event_stream_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = _stream_source(spark, event_stream_dir).filter(
        F.col("event_type") == "click"
    )
    stream_result = _run_stream(
        spark,
        stream_stream_join(purchases, clicks, within="30 minutes", watermark="31 days"),
        "ssjoin_test",
        mode="append",
    )
    batch_events = table(spark, SF_SMOKE, "events")
    batch_result = stream_stream_join(
        batch_events.filter(F.col("event_type") == "purchase"),
        batch_events.filter(F.col("event_type") == "click"),
        within="30 minutes",
    )
    problems = compare_frames(
        stream_result.columns,
        [tuple(r) for r in stream_result.collect()],
        batch_result.columns,
        [tuple(r) for r in batch_result.collect()],
    )
    assert problems == []
    assert stream_result.count() > 0


def test_stream_stream_left_join_withholds_watermark_tail(spark, event_stream_dir):
    """LEFT OUTER stream-stream join contract: matched rows equal the
    batch join's; unmatched (NULL-right) rows emit only once the
    watermark passes, so the stream's unmatched set is exactly the batch
    unmatched set MINUS purchases later than (max event time - delay) —
    nothing withheld before the watermark, nothing invented after."""
    from waterbear_spark.streaming import stream_stream_left_join

    wm_delay = "1 hour"
    purchases = _stream_source(spark, event_stream_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = _stream_source(spark, event_stream_dir).filter(
        F.col("event_type") == "click"
    )
    stream_result = _run_stream(
        spark,
        stream_stream_left_join(
            purchases, clicks, within="30 minutes", watermark=wm_delay
        ),
        "ssleft_test",
        mode="append",
    ).collect()

    batch_events = table(spark, SF_SMOKE, "events")
    batch_rows = stream_stream_left_join(
        batch_events.filter(F.col("event_type") == "purchase"),
        batch_events.filter(F.col("event_type") == "click"),
        within="30 minutes",
    ).collect()

    s_matched = {(r.l_event, r.r_event) for r in stream_result if r.r_event is not None}
    b_matched = {(r.l_event, r.r_event) for r in batch_rows if r.r_event is not None}
    assert s_matched == b_matched, "matched pairs must not depend on mode"

    s_unmatched = {r.l_event for r in stream_result if r.r_event is None}
    b_unmatched = {r.l_event for r in batch_rows if r.r_event is None}
    assert s_unmatched <= b_unmatched, "stream invented an unmatched row"
    # every batch-unmatched purchase the final watermark definitely
    # passed must have been emitted. Spark emits an outer NULL only
    # after the watermark (max ts - delay, advanced at batch
    # boundaries) clears the row's full join window (l_ts + within),
    # so the guaranteed-emitted horizon subtracts delay + within + one
    # batch of slack.
    import datetime as dt

    max_ts = max(r.l_ts for r in batch_rows)
    horizon = max_ts - dt.timedelta(hours=2)
    overdue = {
        r.l_event
        for r in batch_rows
        if r.r_event is None and r.l_ts < horizon
    }
    missing = overdue - s_unmatched
    assert not missing, f"watermark passed but rows withheld: {sorted(missing)[:5]}"
    assert s_unmatched, "no unmatched rows emitted at all"


def test_stream_dedup_drops_planted_duplicates(spark, tmp_path):
    events = table(spark, SF_SMOKE, "events").limit(200)
    doubled_dir = str(tmp_path / "doubled")
    events.unionAll(events).coalesce(2).write.mode("overwrite").json(doubled_dir)

    schema = events.schema
    stream = spark.readStream.schema(schema).json(doubled_dir)
    result = _run_stream(
        spark, stream_dedup(stream), "dedup_test", mode="append"
    )
    assert result.count() == 200


def test_stream_static_join_matches_batch(spark, event_stream_dir):
    """Stream-static enrichment (fact stream x broadcast dim) equals the
    batch join; no state, dimension re-read per micro-batch."""
    from waterbear_spark.streaming import stream_static_enrich

    dim = table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream_static_enrich(
        _stream_source(spark, event_stream_dir), dim
    ).groupBy("c_mktsegment").count()
    stream_result = _run_stream(spark, enriched, "ss_enrich_test")
    batch_result = (
        stream_static_enrich(table(spark, SF_SMOKE, "events"), dim)
        .groupBy("c_mktsegment")
        .count()
    )
    problems = compare_frames(
        stream_result.columns,
        [tuple(r) for r in stream_result.collect()],
        batch_result.columns,
        [tuple(r) for r in batch_result.collect()],
    )
    assert problems == []
    assert stream_result.count() > 0


def test_session_gap_boundary_merges(spark, tmp_path):
    """An event landing EXACTLY one gap after the previous one merges
    into the session (F.session_window semantics, probed empirically);
    one microsecond past the gap starts a new session. The catalog
    oracle for session_metrics_user must agree — its lag condition is
    strictly-greater, and this pins it against the real engine."""
    import datetime as dt

    import duckdb

    from waterbear_spark.queries import streaming_queries

    def t(h, m, us=0):
        return dt.datetime(2024, 1, 1, h, m, 0, us)

    rows = [
        (1, t(0, 0), 1, "view", 1.0, "{}"),
        (2, t(0, 30), 1, "view", 1.0, "{}"),       # exactly gap later: merge
        (3, t(1, 30, 1), 1, "view", 1.0, "{}"),    # 1us past gap: new session
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = [
        (r.session_start, r.session_end, r.n_events)
        for r in streaming_queries.session_metrics_user(spark, sf).collect()
    ]
    assert got == [
        (t(0, 0), t(1, 0), 2),
        (t(1, 30, 1), t(2, 0, 1), 1),
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    oracle = [
        (r[0], r[1], r[3])
        for r in con.execute(streaming_queries._SESSION_SQL).fetchall()
    ]
    con.close()
    assert oracle == got


def test_windowed_topk_stream_matches_batch(spark, event_stream_dir):
    """The [[windowed_topk_types]] docstring promises a streaming twin:
    the (day-window, type) count aggregate runs under a watermark, and
    the rank is applied to the closed windows (post-aggregation, as a
    foreachBatch consumer would). Leaders must equal the batch query."""
    from waterbear_spark.queries.timeseries import (
        _TOPK_PER_WINDOW,
        windowed_topk_types,
    )

    src = _stream_source(spark, event_stream_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")  # watermark needs TIMESTAMP; UTC session keeps values
    )
    counts = (
        src.withWatermark("ts", "31 days")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    streamed = _run_stream(spark, counts, "topk_stream_test")
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    got = (
        streamed.select(
            F.col("window.start").cast("date").alias("day"), "event_type", "n"
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK_PER_WINDOW)
        .select("day", "rnk", "event_type", "n")
    )
    batch = windowed_topk_types(spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_freshness_aggregate_stream_matches_batch(spark, event_stream_dir):
    """[[freshness_report]]'s scan-side aggregate (per-type last_ts +
    count) is streamable as-is; the staleness post-processing runs on
    the |types|-row result. Stream agg must equal the batch dimensions."""
    from waterbear_spark.queries.quality_queries import freshness_report

    src = _stream_source(spark, event_stream_dir)
    per_type = src.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_total")
    )
    streamed = _run_stream(spark, per_type, "freshness_stream_test")
    batch = freshness_report(spark, SF_SMOKE).select(
        "event_type", "last_ts", "n_total"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
