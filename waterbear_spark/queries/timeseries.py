"""Time-series operator extensions over ``events``: rolling distinct
counts, exponential smoothing, and SCD2 interval materialization.

These cover the three time-series shapes the rest of the catalog doesn't:
a sliding *distinct* aggregate (not decomposable into partial sums), a
sequential recurrence (EMA), and change-data-capture history building
(SCD2) as a batch query. All pure Catalyst; float determinism follows the
house rules in ``tables.py`` (decimal sums; any IEEE fold evaluated in an
explicitly pinned order on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import dsum, epoch_us, oracle_dsum, table

_ROLL_DAYS = 7
_EMA_ALPHA = 0.3


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. COUNT(DISTINCT) over
    a sliding window is the one windowed aggregate with no partial-merge
    decomposition, so the standard rewrite is *contribution expansion*:
    reduce to distinct (day, user) pairs first, then explode each pair
    into the 7 window-end days it contributes to and run one plain
    distinct-count aggregate. No self-join, no window function.

    Scale: the distinct pass shrinks events to (days x users) rows before
    the 7x fan-out, and the fan-out is map-side (``explode`` of a
    7-element sequence); the only shuffles are the distinct and the final
    day aggregate — both on bounded keys. A range self-join formulation
    would be a BroadcastNestedLoop (banned by the plan lint); this shape
    stays hash-partitioned at any scale.
    """
    events = table(spark, sf_dir, "events")
    day_user = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    max_day = day_user.agg(F.max("day").alias("max_day"))
    contrib = day_user.select(
        F.explode(F.sequence(F.lit(0), F.lit(_ROLL_DAYS - 1))).alias("i"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("i")).alias("day_w"), "user_id")
    return (
        contrib.crossJoin(F.broadcast(max_day))
        .filter(F.col("day_w") <= F.col("max_day"))
        .groupBy("day_w")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
        .select(F.col("day_w").alias("day"), "n_users_7d")
        .orderBy("day")
    )


ROLLING_DISTINCT_USERS_SQL = f"""
WITH day_user AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
contrib AS (
    SELECT day + CAST(i AS INTEGER) AS day_w, user_id
    FROM day_user, generate_series(0, {_ROLL_DAYS - 1}) AS t(i)
)
SELECT day_w AS day, COUNT(DISTINCT user_id) AS n_users_7d
FROM contrib
WHERE day_w <= (SELECT MAX(day) FROM day_user)
GROUP BY day_w
ORDER BY day
"""


def ema_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per event
    type — the classic sequential recurrence (``ema = a*x + (1-a)*ema``)
    that has no associative decomposition. The rewrite: aggregate to one
    row per (type, day) with an exact decimal sum, then fold the
    day-sorted array with ``F.aggregate`` so the IEEE operation order is
    pinned — DuckDB's ``list_reduce`` over ``list(... ORDER BY day)``
    performs the bit-identical fold (both seed the accumulator with the
    first element).

    Scale: the recurrence runs over the *aggregated* series (days per
    key, not raw events), so the array is bounded by the calendar, not
    the data; at 100 TB the shape is unchanged — one shuffle to (type,
    day), one to type. Long series would segment the fold per epoch and
    carry the closed-form decay ``(1-a)^len`` across segments.
    """
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(dsum(F.col("value"), "rev"))
    arr = F.array_sort(F.collect_list(F.struct("day", "rev")))
    vals = F.transform(arr, lambda s: s["rev"])
    a = F.lit(float(_EMA_ALPHA))
    ema = F.aggregate(
        F.slice(vals, F.lit(2), F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("day").alias("last_day"),
            F.round(ema, 4).alias("ema_revenue"),
        )
        .orderBy("event_type")
    )


EMA_DAILY_REVENUE_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           {oracle_dsum("value", "rev")}
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
folded AS (
    SELECT event_type,
           COUNT(*) AS n_days,
           MAX(day) AS last_day,
           list(rev ORDER BY day) AS vals
    FROM daily GROUP BY event_type
)
SELECT event_type, n_days, last_day,
       ROUND(list_reduce(vals, (acc, x) -> {_EMA_ALPHA}*x + {1.0 - _EMA_ALPHA}*acc), 4)
           AS ema_revenue
FROM folded
ORDER BY event_type
"""


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build from a change stream: treating each user's
    event_type sequence as a dimension attribute, emit one validity
    interval per attribute *change* (``valid_from`` = change timestamp,
    ``valid_to`` = next change, open for the current state) — the batch
    form of the CDC->SCD2 merge in ``streaming/cdc.py``. Output is the
    per-state interval census: interval count, open-interval count, and
    exact mean closed-interval duration.

    Scale: two windows over the same (user_id) partitioning — Catalyst
    evaluates both in a single sort+shuffle — then one bounded aggregate.
    Duration math is integer microseconds (exact); no floats until the
    final single division.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    intervals = changed.select(
        "user_id",
        "event_type",
        epoch_us("ts").alias("from_us"),
        epoch_us(F.lead("ts").over(w2)).alias("to_us"),
    )
    return (
        intervals.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.count(F.when(F.col("to_us").isNull(), 1)).alias("n_open"),
            # integer DIV on both engines (DuckDB `//`): double division
            # then cast would truncate in Spark but round in DuckDB.
            # The duration sum accumulates in DECIMAL(38,0) — microsecond
            # sums cross int64 around 1e6 users x 1e12 us (the integer-
            # width discipline in SCALE.md); DuckDB's SUM is HUGEINT
            # natively
            F.expr(
                "sum(cast(case when to_us is not null then to_us - from_us end"
                " as decimal(38,0))) div count(to_us)"
            ).alias("mean_closed_us"),
            F.sum("user_id").cast("bigint").alias("user_checksum"),
        )
        .orderBy("event_type")
    )


SCD2_INTERVALS_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_state
    FROM events
),
changes AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev_state IS NULL OR prev_state <> event_type
),
intervals AS (
    SELECT user_id, event_type,
           epoch_us(ts) AS from_us,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS to_us
    FROM changes
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       COUNT(CASE WHEN to_us IS NULL THEN 1 END) AS n_open,
       CAST(SUM(CASE WHEN to_us IS NOT NULL THEN to_us - from_us END)
            // COUNT(to_us) AS BIGINT) AS mean_closed_us,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum
FROM intervals
GROUP BY event_type
ORDER BY event_type
"""


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by day ("total users ever seen"). A
    naive cumulative COUNT(DISTINCT) window rescans all history per day;
    the standard rewrite maps each user to their FIRST day (one
    aggregate), counts first-appearances per day, and takes a running
    sum over the tiny day-indexed relation — the distinct-to-first-
    occurrence reduction, dual of [[rolling_distinct_users]]'s
    contribution expansion.

    Scale: one user-keyed aggregate (combinable) + a window over
    |days| rows. History length never enters the cost.
    """
    events = table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    per_day = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.withColumn("cum_users", F.sum("n_new").over(w))
        .orderBy("day")
    )


CUMULATIVE_DISTINCT_USERS_SQL = """
WITH first_day AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
per_day AS (
    SELECT day, COUNT(*) AS n_new FROM first_day GROUP BY day
)
SELECT day, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_users
FROM per_day
ORDER BY day
"""


_TOPK_PER_WINDOW = 2


def windowed_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event types per tumbling day window — the windowed-rank shape
    every monitoring dashboard runs (streaming twin: the same aggregate
    under ``F.window`` + watermark emits per-window leaders as windows
    close). Rank ties break on type name for determinism.

    Scale: one (window, type) aggregate — combinable — then a rank
    window over |types| rows per day.
    """
    events = table(spark, sf_dir, "events")
    counts = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK_PER_WINDOW)
        .select("day", "rnk", "event_type", "n")
        .orderBy("day", "rnk")
    )


WINDOWED_TOPK_TYPES_SQL = f"""
WITH counts AS (
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT day, rnk, event_type, n
FROM (
    SELECT day, event_type, n,
           ROW_NUMBER() OVER (PARTITION BY day
                              ORDER BY n DESC, event_type) AS rnk
    FROM counts
)
WHERE rnk <= {_TOPK_PER_WINDOW}
ORDER BY day, rnk
"""


QUERIES = {
    "rolling_distinct_users": rolling_distinct_users,
    "ema_daily_revenue": ema_daily_revenue,
    "scd2_intervals": scd2_intervals,
    "cumulative_distinct_users": cumulative_distinct_users,
    "windowed_topk_types": windowed_topk_types,
}

ORACLES = {
    "rolling_distinct_users": ROLLING_DISTINCT_USERS_SQL,
    "ema_daily_revenue": EMA_DAILY_REVENUE_SQL,
    "scd2_intervals": SCD2_INTERVALS_SQL,
    "cumulative_distinct_users": CUMULATIVE_DISTINCT_USERS_SQL,
    "windowed_topk_types": WINDOWED_TOPK_TYPES_SQL,
}
