"""Structured Streaming operators: watermarked tumbling/sliding/session
windows and stateful dedup over an event stream.

Parity target: the reference only documents streaming as "the same schema
applied through readStream / Auto Loader" (README.md:82-98) and delegates
state to DLT. Here the streaming surface is first-class: each transform
takes a (possibly streaming) DataFrame and returns the aggregated stream,
so the same function serves batch backfill and incremental execution —
run under ``trigger(availableNow=True)`` + checkpoint for exactly-once
incremental batches.

Scale notes: watermarks bound state size (late rows beyond the horizon are
dropped, state for closed windows is evicted); windowed aggregation state
is partitioned by (window, keys) across executors; ``dropDuplicates``
state is partitioned by the id columns — always include the event-time
column + watermark so the dedup map can evict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import DEC


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Streaming event time must be TIMESTAMP: parquet/json sources surface
    naive timestamps as TIMESTAMP_NTZ (rejected by ``withWatermark``), so
    cast it up front. Applied to batch inputs too, so batch backfill and
    incremental runs of the same transform agree on output types. Run
    sessions at UTC (``conf.recommended_conf``) and the cast is a no-op on
    the underlying micros.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) windowed counts + sums.

    Works identically on batch and streaming inputs; on a stream the
    watermark lets Spark finalize windows and evict their state.
    """
    events = ensure_event_time(events, ts_col)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    stream = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        stream.groupBy(win.alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_metrics(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: activity bursts per key separated by ``gap`` of
    silence. State is one open session per key, merged as events arrive.
    """
    events = ensure_event_time(events, ts_col)
    stream = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        stream.groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "10 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time stream-stream inner join: pair each left event with the
    same user's right events from the preceding ``within`` interval
    (right.ts in (left.ts - within, left.ts]).

    The attribution-join shape (click <- impression). Both sides carry
    watermarks and the join condition bounds event-time distance — the two
    requirements that let Spark evict buffered rows once the watermark
    passes ``left.ts - within``; without the time bound the state store
    grows forever. State is hash-partitioned by the join key across
    executors, same as a batch shuffle join.

    Batch/stream polymorphic like every transform here; in batch the same
    plan is an ordinary range-bounded equi-join.
    """
    left = ensure_event_time(left, ts_col)
    right = ensure_event_time(right, ts_col)
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key_col).alias("l_user"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    r = right.select(
        F.col(key_col).alias("r_user"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("l_user").alias("user_id"),
        "l_event",
        "r_event",
        "l_ts",
        "r_ts",
        "r_value",
    )


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "10 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time stream-stream LEFT OUTER join: like
    ``stream_stream_join`` but left rows with no right match within the
    interval survive with NULL right columns — the attribution shape
    that also reports *unconverted* events.

    Streaming semantics: Spark can only emit an unmatched left row once
    the watermark has passed ``l_ts`` (until then a matching right row
    could still arrive), so with a finite source the trailing
    ``watermark`` of unmatched rows is withheld at stream end. Matched
    rows stream out immediately. ``tests/test_streaming.py`` pins
    exactly this contract; the batch run of the same plan has no such
    tail (no watermark, the join is an ordinary outer range join).
    """
    left = ensure_event_time(left, ts_col)
    right = ensure_event_time(right, ts_col)
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key_col).alias("l_user"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    r = right.select(
        F.col(key_col).alias("r_user"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {within}")),
        "left_outer",
    ).select(
        F.col("l_user").alias("user_id"),
        "l_event",
        "r_event",
        "l_ts",
        "r_ts",
        "r_value",
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
) -> DataFrame:
    """Stream-static join: enrich a (possibly streaming) fact with a
    static dimension — the canonical silver-layer lookup. No watermark
    or state needed: Spark re-plans the static side per micro-batch, and
    a small dimension broadcasts, so each batch is a scan + broadcast
    probe with zero streaming state.
    """
    return events.join(
        F.broadcast(dim), F.col(on_left) == F.col(on_right), "left"
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate events by id within the watermark horizon.

    Including ``ts_col`` in the key set (Spark requirement for streaming
    dedup with watermark) bounds the state store: entries older than the
    watermark are evicted instead of accumulating forever.
    """
    id_cols = id_cols or ["event_id"]
    events = ensure_event_time(events, ts_col)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicates(
            id_cols + [ts_col]
        )
    return events.dropDuplicates(id_cols + [ts_col])
