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
from waterbear_spark.streaming.windows import stream_stream_join

_WITHIN = "10 minutes"


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


QUERIES = {"attribution_join": attribution_join}
ORACLES = {"attribution_join": _ATTRIBUTION_SQL}
