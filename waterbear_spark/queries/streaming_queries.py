"""Batch twins of the streaming operators, as oracle-checked catalog
entries.

Every transform in ``streaming/windows.py`` is batch/stream polymorphic;
these wrappers run them on the batch ``events`` table so the driver's
DuckDB harness certifies the *semantics*, while ``tests/test_streaming.py``
separately proves the streaming execution (file source, AvailableNow,
checkpoint resume) produces identical frames. Together the two checks
pin both halves of the Kappa contract: one definition, batch backfill ==
incremental run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table
from waterbear_spark.streaming.windows import (
    session_metrics,
    stream_dedup,
    stream_stream_join,
    stream_stream_left_join,
)

_WITHIN = "10 minutes"
_GAP = "30 minutes"


def attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase paired with the same user's clicks in
    the preceding 10 minutes — the canonical event-time stream-stream
    join, run here in batch mode (identical plan minus watermark state).

    Scale: both sides shuffle once on ``user_id``; the time-band
    condition keeps state bounded in the streaming run and lets the
    batch run prune pairs inside the sort-merge join.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = stream_stream_join(purchases, clicks, within=_WITHIN)
    return joined.select(
        "user_id",
        "l_event",
        "r_event",
        F.col("l_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("click_ts"),
        F.round(F.col("r_value").cast("decimal(20,6)"), 2)
        .cast("double")
        .alias("click_value"),
    ).orderBy("user_id", "l_event", "r_event")


_ATTRIBUTION_SQL = f"""
SELECT p.user_id,
       p.event_id AS l_event,
       c.event_id AS r_event,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       CAST(ROUND(CAST(c.value AS DECIMAL(20,6)), 2) AS DOUBLE) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL {_WITHIN}
ORDER BY p.user_id, l_event, r_event
"""


def session_metrics_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) over the
    events table, through the SAME ``session_metrics`` transform the
    streaming path runs — this batch twin gives ``F.session_window``'s
    merge semantics a cross-engine oracle (the DuckDB side is the
    classic lag-gap sessionization), where previously only the
    stream-vs-batch equivalence test covered it.

    Scale: session_window is one shuffle on (key); state per key is the
    open session. The oracle's window formulation sorts per user — the
    Spark side's merge is the scalable form.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    return (
        session_metrics(ev, gap=_GAP, ts_col="ts", key_col="user_id")
        .select(
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


_SESSION_SQL = """
WITH marked AS (
    SELECT user_id, ts, event_id, value,
           -- strictly greater: F.session_window MERGES an event landing
           -- exactly gap after the previous one (probed empirically;
           -- tests/test_streaming.py::test_session_gap_boundary_merges)
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS sum_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def dedup_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay collapsed by ``stream_dedup``: the events
    table is deliberately doubled (every event delivered twice, the
    at-least-once failure mode) and pushed through the same dedup
    transform the streaming path uses; the per-type totals must equal
    the ORIGINAL table's — which is exactly what the oracle computes, so
    any dropped or surviving duplicate hash-mismatches.

    Scale: dropDuplicates is one shuffle on the id key with map-side
    first-row combine; in the streaming run the watermark bounds state.
    """
    ev = table(spark, sf_dir, "events")
    replayed = ev.unionByName(ev)
    deduped = stream_dedup(replayed, id_cols=["event_id"])
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


_DEDUP_REPLAY_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def attribution_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase conversion census via the LEFT OUTER stream-stream
    join: every purchase with the count of same-user clicks in the
    preceding 10 minutes — zero for unconverted purchases, which an
    inner join would silently drop. Batch twin of
    ``stream_stream_left_join`` (the streaming run withholds the
    watermark tail of unmatched rows; see tests/test_streaming.py).

    Scale: identical to [[attribution_join]] — one shuffle per side on
    user_id, outer rows ride the same sort-merge join.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = stream_stream_left_join(purchases, clicks, within=_WITHIN)
    return (
        joined.groupBy("user_id", "l_event")
        .agg(
            F.count("r_event").alias("n_clicks"),
            F.min(F.col("l_ts").cast("timestamp_ntz")).alias("purchase_ts"),
        )
        .select(
            "user_id",
            F.col("l_event").alias("purchase_event"),
            "n_clicks",
            "purchase_ts",
        )
        .orderBy("user_id", "purchase_event")
    )


_ATTRIBUTION_UNMATCHED_SQL = f"""
SELECT p.user_id,
       p.event_id AS purchase_event,
       COUNT(c.event_id) AS n_clicks,
       MIN(p.ts) AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL {_WITHIN}
GROUP BY p.user_id, p.event_id
ORDER BY p.user_id, purchase_event
"""


QUERIES = {
    "attribution_join": attribution_join,
    "session_metrics_user": session_metrics_user,
    "dedup_stream_replay": dedup_stream_replay,
    "attribution_unmatched": attribution_unmatched,
}
ORACLES = {
    "attribution_join": _ATTRIBUTION_SQL,
    "session_metrics_user": _SESSION_SQL,
    "dedup_stream_replay": _DEDUP_REPLAY_SQL,
    "attribution_unmatched": _ATTRIBUTION_UNMATCHED_SQL,
}
