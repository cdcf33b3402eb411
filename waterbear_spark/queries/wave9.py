"""Round-3 wave-9 operators: SQL-surface parity additions (aggregate
FILTER clause, multiset EXCEPT/INTERSECT ALL, GROUP BY ALL / ORDER BY
ALL) plus the Brier-decomposed calibration table.

The three SQL-surface queries follow ``sqlsurface.py``'s discipline: ONE
dialect-neutral SQL string runs byte-identical on both engines — any
divergence is an engine-semantics difference, not a translation
artifact.

* ``filter_clause_aggs`` — the SQL:2003 aggregate FILTER clause
  (per-aggregate predicates without CASE scaffolding).
* ``set_ops_all`` — multiset set operations (INTERSECT ALL / EXCEPT
  ALL): bag semantics the DISTINCT variants can't express.
* ``group_order_by_all`` — GROUP BY ALL / ORDER BY ALL (the modern
  shorthand both engines now share).
* ``calibration_brier`` — reliability table over exact score ventiles
  with the Brier score and its calibration term, all in exact decimal
  (the ventile probabilities are 1/40-grid rationals).

Float determinism follows the house rules in ``tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table


FILTER_CLAUSE_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
                  FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE)
           AS rev_finished,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS max_open
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def filter_clause_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 aggregate ``FILTER (WHERE ...)`` clause — per-aggregate
    predicates in one pass, the idiomatic replacement for CASE-WHEN
    scaffolds. One dialect-neutral SQL string IS the oracle.

    Scale: Catalyst compiles each FILTER into the aggregate's merge
    condition — still one map-side-combinable HashAggregate, no extra
    scan per filtered aggregate.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(FILTER_CLAUSE_SQL)


SET_OPS_ALL_SQL = """
WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
both_all AS (SELECT o_custkey FROM f INTERSECT ALL SELECT o_custkey FROM o),
only_f AS (SELECT o_custkey FROM f EXCEPT ALL SELECT o_custkey FROM o)
SELECT 'except_all' AS op, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_keys
FROM only_f
UNION ALL
SELECT 'intersect_all' AS op, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_keys
FROM both_all
ORDER BY op
"""


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations: ``INTERSECT ALL`` keeps min(multiplicity)
    copies per key, ``EXCEPT ALL`` subtracts multiplicities — bag
    semantics the DISTINCT variants collapse. Byte-identical SQL on
    both engines.

    Scale: both compile to one hash-partitioned count-compare per key
    (Spark: aggregate + generate replication) — no sort, no pair join.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SET_OPS_ALL_SQL)


GROUP_ORDER_ALL_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
           AS revenue
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


def group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` — group by every non-aggregate
    select item, order by the full select list; the modern shorthand
    both engines share, certified byte-identical.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(GROUP_ORDER_ALL_SQL)


# ---------------------------------------------------------------------------
# Calibration table with Brier decomposition
# ---------------------------------------------------------------------------

_CAL_BINS = 20


def calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) table: orders ranked into {k} exact
    ventiles of o_totalprice (distributed NTILE — no global sort); each
    ventile's nominal probability is its midpoint p_hat = (2*tile-1)/{kk}
    — a 1/{kk}-grid rational, so every per-row Brier term (p_hat - y)^2
    is an EXACT decimal and the bin sums are order-free. Reports the
    observed rate, the gap (calibration error), the per-bin Brier mean,
    and the overall Brier score on every row.

    This is [[decile_lift_table]]'s sibling for probability quality:
    lift measures discrimination, this measures calibration.
    """
    from waterbear_spark.operators.ntile import bucketed_ntile

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    tiled = bucketed_ntile(
        o, "o_totalprice", "o_orderkey", _CAL_BINS, out_col="tile", width=1024.0
    )
    # p_hat on the 1/40 grid as exact decimal; (p-y)^2 = p^2 or (1-p)^2,
    # both exact decimals
    p_num = 2 * F.col("tile") - 1  # numerator over 40
    brier_num = F.when(
        F.col("y") == 1, (40 - p_num) * (40 - p_num)
    ).otherwise(p_num * p_num)  # over 1600
    per = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        F.sum(brier_num.cast("decimal(38,0)")).alias("brier_num"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "tile",
        "n",
        "pos",
        F.round((2 * F.col("tile") - 1) / (2.0 * _CAL_BINS), 6).alias("p_hat"),
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("obs_rate"),
        F.round(
            F.col("pos").cast("double") / F.col("n")
            - (2 * F.col("tile") - 1) / (2.0 * _CAL_BINS),
            6,
        ).alias("gap"),
        F.round(
            F.col("brier_num").cast("double") / F.col("n") / 1600.0, 6
        ).alias("brier_bin"),
        F.round(
            F.sum("brier_num").over(w_all).cast("double")
            / F.sum("n").over(w_all)
            / 1600.0,
            6,
        ).alias("brier_total"),
    ).orderBy("tile")

calibration_brier.__doc__ = calibration_brier.__doc__.format(k=_CAL_BINS, kk=2 * _CAL_BINS)


CALIBRATION_SQL = f"""
WITH tiled AS (
    SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
           NTILE({_CAL_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
    FROM orders
),
per AS (
    SELECT tile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos,
           CAST(SUM(CAST(CASE WHEN y = 1
                    THEN (40 - (2 * tile - 1)) * (40 - (2 * tile - 1))
                    ELSE (2 * tile - 1) * (2 * tile - 1) END
               AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS brier_num
    FROM tiled GROUP BY tile
)
SELECT tile, n, pos,
       ROUND((2 * tile - 1) / {2.0 * _CAL_BINS}, 6) AS p_hat,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS obs_rate,
       ROUND(CAST(pos AS DOUBLE) / n - (2 * tile - 1) / {2.0 * _CAL_BINS}, 6)
           AS gap,
       ROUND(CAST(brier_num AS DOUBLE) / n / 1600.0, 6) AS brier_bin,
       ROUND(CAST(SUM(brier_num) OVER () AS DOUBLE) / SUM(n) OVER () / 1600.0, 6)
           AS brier_total
FROM per
ORDER BY tile
"""


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing
# ---------------------------------------------------------------------------

_HW_ALPHA = 0.3
_HW_BETA = 0.1
_HW_GAMMA = 0.2
_HW_M = 7  # weekly season


def holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing on daily order revenue
    (weekly season, m={m}) with a 1..{m}-day-ahead forecast — the
    3-component recurrence (level, trend, {m}-slot seasonal ring) that
    completes the exponential family next to [[ema_daily_revenue]]
    (1 state) and [[holt_linear_forecast]] (2 states).

    Init (standard): l0 = mean of week 1, b0 = (x7 - x1)/6, seasonal
    s_j = x_j - l0; the fold then steps days 8..N carrying the seasonal
    RING as an array (shift-and-append each day). Forecast(h) =
    l + h*b + s[h].

    Cross-engine exactness: the Spark fold and the DuckDB recursive CTE
    write the IDENTICAL IEEE expression tree each step (the
    [[holt_linear_forecast]] discipline, extended to array state — the
    ring update is slice+append on both sides), so the doubles are
    bit-exact without any decimal quantization of the state.

    Scale: the recurrence runs on the day-grain series — calendar-
    bounded at any corpus size; the heavy work is the combinable daily
    aggregate underneath.
    """
    from waterbear_spark.queries.tables import dsum

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("day", F.col("o_orderdate").cast("timestamp_ntz")).alias(
                "day"
            )
        )
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    arr = F.array_sort(F.collect_list(F.struct("day", "rev")))
    vals = F.transform(arr, lambda s: s["rev"])
    # try_element_at: on an empty/short series the init state is NULL
    # and the n_days filter drops the row — no ANSI index error
    x = [F.try_element_at(vals, F.lit(i)) for i in range(1, _HW_M + 1)]
    a, be, g = F.lit(_HW_ALPHA), F.lit(_HW_BETA), F.lit(_HW_GAMMA)
    ca, cb, cg = F.lit(1.0 - _HW_ALPHA), F.lit(1.0 - _HW_BETA), F.lit(
        1.0 - _HW_GAMMA
    )
    l0 = (
        x[0] + x[1] + x[2] + x[3] + x[4] + x[5] + x[6]
    ) / F.lit(7.0)
    b0 = (x[6] - x[0]) / F.lit(6.0)
    s0 = F.transform(F.slice(vals, 1, _HW_M), lambda v: v - l0)

    lnew = lambda acc, xv: a * (xv - F.element_at(acc["s"], 1)) + ca * (  # noqa: E731
        acc["l"] + acc["b"]
    )
    state = F.aggregate(
        F.slice(vals, _HW_M + 1, F.greatest(F.size(vals) - _HW_M, F.lit(0))),
        F.struct(l0.alias("l"), b0.alias("b"), s0.alias("s")),
        lambda acc, xv: F.struct(
            lnew(acc, xv).alias("l"),
            (be * (lnew(acc, xv) - acc["l"]) + cb * acc["b"]).alias("b"),
            F.concat(
                F.slice(acc["s"], 2, _HW_M - 1),
                F.array(
                    g * (xv - (acc["l"] + acc["b"]))
                    + cg * F.element_at(acc["s"], 1)
                ),
            ).alias("s"),
        ),
    )
    folded = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("day").alias("last_day"),
        state.alias("st"),
    ).filter(F.col("n_days") >= 2 * _HW_M)
    return (
        folded.select(
            "n_days",
            F.to_date("last_day").alias("last_day"),
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
            F.col("st.s").alias("s"),
            F.explode(F.sequence(F.lit(1), F.lit(_HW_M))).alias("h"),
        )
        .select(
            "h",
            "n_days",
            "last_day",
            F.round("l", 4).alias("level"),
            F.round("b", 4).alias("trend"),
            F.round(F.element_at(F.col("s"), F.col("h")), 4).alias("seasonal"),
            F.round(
                F.col("l")
                + F.col("h").cast("double") * F.col("b")
                + F.element_at(F.col("s"), F.col("h")),
                4,
            ).alias("forecast"),
        )
        .orderBy("h")
    )

holt_winters_seasonal.__doc__ = holt_winters_seasonal.__doc__.format(m=_HW_M)


def _hw_sql() -> str:
    from waterbear_spark.queries.tables import oracle_dsum

    a, ca = _HW_ALPHA, 1.0 - _HW_ALPHA
    be, cb = _HW_BETA, 1.0 - _HW_BETA
    g, cg = _HW_GAMMA, 1.0 - _HW_GAMMA
    xs = ", ".join(
        f"MAX(CASE WHEN i = {i} THEN rev END) AS x{i}"
        for i in range(1, _HW_M + 1)
    )
    s0 = ", ".join(f"x{i} - l0" for i in range(1, _HW_M + 1))
    lnew = f"{a} * (s.rev - r.s[1]) + {ca} * (r.l + r.b)"
    return f"""
WITH RECURSIVE daily AS (
    SELECT DATE_TRUNC('day', o_orderdate) AS day,
           {oracle_dsum("o_totalprice", "rev")}
    FROM orders GROUP BY 1
),
seq AS (
    SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily
),
meta AS (SELECT COUNT(*) AS n_days, MAX(day) AS last_day FROM daily),
week1 AS (SELECT {xs} FROM seq WHERE i <= {_HW_M}),
init0 AS (
    SELECT (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0 AS l0,
           (x7 - x1) / 6.0 AS b0,
           x1, x2, x3, x4, x5, x6, x7
    FROM week1
),
rec AS (
    SELECT {_HW_M} AS i, l0 AS l, b0 AS b, [{s0}] AS s FROM init0
    UNION ALL
    SELECT r.i + 1,
           {lnew},
           {be} * (({lnew}) - r.l) + {cb} * r.b,
           r.s[2:{_HW_M}]
               || [{g} * (s.rev - (r.l + r.b)) + {cg} * r.s[1]]
    FROM rec r JOIN seq s ON s.i = r.i + 1
),
final AS (
    SELECT r.l, r.b, r.s, m.n_days, m.last_day
    FROM rec r JOIN meta m ON r.i = m.n_days
    WHERE m.n_days >= {2 * _HW_M}
)
SELECT h, n_days, CAST(last_day AS DATE) AS last_day,
       ROUND(l, 4) AS level,
       ROUND(b, 4) AS trend,
       ROUND(s[h], 4) AS seasonal,
       ROUND(l + CAST(h AS DOUBLE) * b + s[h], 4) AS forecast
FROM final, (SELECT UNNEST(generate_series(1, {_HW_M})) AS h)
ORDER BY h
"""


QUERIES = {
    "filter_clause_aggs": filter_clause_aggs,
    "set_ops_all": set_ops_all,
    "group_order_by_all": group_order_by_all,
    "calibration_brier": calibration_brier,
    "holt_winters_seasonal": holt_winters_seasonal,
}

ORACLES = {
    "filter_clause_aggs": FILTER_CLAUSE_SQL,
    "set_ops_all": SET_OPS_ALL_SQL,
    "group_order_by_all": GROUP_ORDER_ALL_SQL,
    "calibration_brier": CALIBRATION_SQL,
    "holt_winters_seasonal": _hw_sql(),
}
