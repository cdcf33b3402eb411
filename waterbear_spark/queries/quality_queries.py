"""The reference's core capability inside the correctness harness: compile
a JSON-Schema entity, evaluate its expectations over a real table, and
produce the per-rule violation report — with a DuckDB oracle generated
from the SAME compiled constraint dict (single source of truth).

The `customer` entity (waterbear_spark/models/customer.json) is designed
so real testdata rows violate it: negative account balances breach the
``minimum: 0`` expectation and the HOUSEHOLD segment is outside the
declared enum — i.e. the quarantine path actually fires.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import waterbear_spark
from waterbear_spark.quality.expectations import Expectations
from waterbear_spark.schema.compiler import SchemaCompiler
from waterbear_spark.queries.tables import table

MODELS_DIR = os.path.join(os.path.dirname(waterbear_spark.__file__), "models")


def _compiled_customer():
    return SchemaCompiler(MODELS_DIR).compile("customer")


def quality_report_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation count per expectation over the customer table (R19-R23
    pipeline, native evaluation)."""
    compiled = _compiled_customer()
    df = table(spark, sf_dir, "customer")
    return (
        Expectations.for_entity(compiled)
        .report(df)
        .orderBy("constraint")
    )


def quality_quarantine_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantined rows (the DLT-gate semantics, R26): key + the violated
    rule names, exploded one row per breached rule for determinism."""
    compiled = _compiled_customer()
    df = table(spark, sf_dir, "customer")
    flagged = Expectations.for_entity(compiled).with_violations(df)
    return (
        flagged.filter(F.size("violations") > 0)
        .select("c_custkey", F.explode("violations").alias("violated"))
        .orderBy("c_custkey", "violated")
    )


def _to_duckdb(expr: str) -> str:
    """Translate a flat-path Spark constraint expression to DuckDB SQL:
    strip backtick quoting, rewrite RLIKE to regexp_matches (all compiler
    regexes are fully anchored, so partial-match == full-match)."""
    out = expr.replace("`", "")
    out = re.sub(
        r"(\w+) RLIKE '([^']*)'",
        lambda m: f"regexp_matches({m.group(1)}, '{m.group(2)}')",
        out,
    )
    return out


def _report_oracle() -> str:
    compiled = _compiled_customer()
    branches = " UNION ALL ".join(
        f"SELECT '{name.replace(chr(39), chr(39) * 2)}' AS \"constraint\","
        f" COUNT(*) FILTER (WHERE NOT ({_to_duckdb(expr)})) AS violations"
        f" FROM customer"
        for name, expr in compiled.constraints.items()
    )
    return (
        f'SELECT "constraint", violations FROM ({branches}) '
        'WHERE violations > 0 ORDER BY "constraint"'
    )


def _quarantine_oracle() -> str:
    compiled = _compiled_customer()
    branches = " UNION ALL ".join(
        f"SELECT c_custkey, '{name.replace(chr(39), chr(39) * 2)}' AS violated"
        f" FROM customer WHERE NOT ({_to_duckdb(expr)})"
        for name, expr in compiled.constraints.items()
    )
    return f"SELECT * FROM ({branches}) ORDER BY c_custkey, violated"


def _compiled_event():
    return SchemaCompiler(MODELS_DIR).compile("event")


def quality_report_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-entity expectations over REAL stream data: the `event`
    entity declares a nested ``props`` object; the raw JSON string column
    is parsed with ``from_json`` against the compiled nested StructType,
    then every constraint — including the backtick-qualified nested path
    `` `props`.`k` `` (reference semantics, utils/util.py:239-252) — is
    evaluated natively and counted per rule.

    Scale: ``from_json`` + constraint evaluation are one codegen stage
    over the scan; the only shuffle is the per-rule count.
    """
    compiled = _compiled_event()
    props_type = next(
        f.dataType for f in compiled.schema.fields if f.name == "props"
    )
    df = table(spark, sf_dir, "events").withColumn(
        "props", F.from_json("props", props_type)
    )
    return Expectations.for_entity(compiled).report(df).orderBy("constraint")


def _event_report_oracle() -> str:
    compiled = _compiled_event()
    src = (
        "(SELECT event_id, event_type, value, "
        "json_transform(props, '{\"k\":\"INTEGER\"}') AS props FROM events)"
    )
    branches = " UNION ALL ".join(
        f"SELECT '{name.replace(chr(39), chr(39) * 2)}' AS \"constraint\","
        f" COUNT(*) FILTER (WHERE NOT ({_to_duckdb(expr)})) AS violations"
        f" FROM {src}"
        for name, expr in compiled.constraints.items()
    )
    return (
        f'SELECT "constraint", violations FROM ({branches}) '
        'WHERE violations > 0 ORDER BY "constraint"'
    )


# (col, kind) — kind picks the min/max string normalizer so the profile
# is hash-comparable across engines (raw double->string formatting is not)
_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of ``orders``: per column non-null /
    null / distinct counts and normalized min/max — the stats sweep behind
    data-quality monitoring and CBO statistics collection.

    Scale: the null/min/max metrics ride ONE narrow pass (a single
    aggregate node), and each exact distinct count runs as its OWN
    single-column two-level aggregate subtree, attached by broadcast
    crossJoins of 1-row relations. r11 fused all six countDistincts into
    the main aggregate, which Spark rewrites into an expand x7 — every
    row replicated seven times through one hash aggregate keyed on
    (gid, value); splitting them drops the expand entirely, each subtree
    scans just its parquet column, and the seven independent subtrees
    run concurrently (guide §2.6) — measured 2.4x at sf0.1 (2.50 ->
    1.05 s interleaved min). The r11 ``_fan_out`` pin is removed with
    the expand: the split subtrees need no full-width repartition (the
    widened variant measured 2.2x SLOWER than the narrow split), and at
    production scan widths it was a no-op anyway.
    """
    orders = table(spark, sf_dir, "orders")

    def norm(kind, c):
        if kind == "double":
            return F.round(c, 2).cast("decimal(20,2)").cast("string")
        if kind == "timestamp":
            return c.cast("date").cast("string")
        return c.cast("string")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"n_{c}"),
            norm(kind, F.min(c)).alias(f"mn_{c}"),
            norm(kind, F.max(c)).alias(f"mx_{c}"),
        ]
    row = orders.agg(*aggs)
    for c, _ in _PROFILE_COLS:
        row = row.crossJoin(
            F.broadcast(
                orders.select(c).agg(F.countDistinct(c).alias(f"d_{c}"))
            )
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"n_{c}").alias("n_nonnull"),
                (F.col("n_rows") - F.col(f"n_{c}")).alias("n_null"),
                F.col(f"d_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_s"),
                F.col(f"mx_{c}").alias("max_s"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*").orderBy("col_name")


def _profile_oracle() -> str:
    norm = {
        "double": "CAST(CAST(ROUND({c}, 2) AS DECIMAL(20,2)) AS VARCHAR)",
        "timestamp": "CAST(CAST({c} AS DATE) AS VARCHAR)",
        "bigint": "CAST({c} AS VARCHAR)",
        "string": "CAST({c} AS VARCHAR)",
    }
    metrics = ["COUNT(*) AS n_rows"]
    for c, kind in _PROFILE_COLS:
        metrics += [
            f"COUNT({c}) AS n_{c}",
            f"COUNT(DISTINCT {c}) AS d_{c}",
            norm[kind].format(c=f"MIN({c})") + f" AS mn_{c}",
            norm[kind].format(c=f"MAX({c})") + f" AS mx_{c}",
        ]
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, n_{c} AS n_nonnull, n_rows - n_{c} AS n_null,"
        f" d_{c} AS n_distinct, mn_{c} AS min_s, mx_{c} AS max_s FROM s"
        for c, _ in _PROFILE_COLS
    )
    cols = ",\n       ".join(metrics)
    return f"WITH s AS (SELECT {cols} FROM orders)\n{branches}\nORDER BY col_name"


def drift_kl_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per day, the KL divergence of that
    day's event-type distribution from the whole-corpus distribution —
    the alarm a training pipeline raises when an upstream producer
    changes mix. Counts are exact integers; the only float work is one
    log-term per (day, type) folded in sorted type order (``aggregate``
    over a sorted array), so the sum order — and the hash — is identical
    across engines.

    Scale: two count aggregates (day x type, then type), a broadcast of
    the |types|-row global distribution, and a per-day fold over <=
    |types| elements — nothing scales with row count after the first
    map-side-combinable count.
    """
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    day_tot = daily.groupBy("day").agg(F.sum("n").alias("day_n"))
    # grand total rides the |types|-row relation as an empty-frame window
    # (no scalar cross join in the plan)
    overall = (
        daily.groupBy("event_type")
        .agg(F.sum("n").alias("g_n"))
        .withColumn("g_tot", F.sum("g_n").over(Window.partitionBy()))
    )
    terms = (
        daily.join(day_tot, "day")
        .join(F.broadcast(overall), "event_type")
        .select(
            "day",
            "event_type",
            (
                (F.col("n") / F.col("day_n"))
                * F.log(
                    (F.col("n") / F.col("day_n"))
                    / (F.col("g_n") / F.col("g_tot"))
                )
            ).alias("term"),
        )
    )
    folded = terms.groupBy("day").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("event_type", "term"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("kl")
    )
    return folded.select(
        "day", F.round("kl", 8).alias("kl_divergence")
    ).orderBy("day")


_DRIFT_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
day_tot AS (SELECT day, SUM(n) AS day_n FROM daily GROUP BY day),
overall AS (SELECT event_type, SUM(n) AS g_n FROM daily GROUP BY event_type),
g_tot AS (SELECT SUM(g_n) AS g_tot FROM overall),
terms AS (
    SELECT d.day, d.event_type,
           (CAST(d.n AS DOUBLE) / day_tot.day_n)
           * LN((CAST(d.n AS DOUBLE) / day_tot.day_n)
                / (CAST(o.g_n AS DOUBLE) / (SELECT g_tot FROM g_tot))) AS term
    FROM daily d
    JOIN day_tot USING (day)
    JOIN overall o USING (event_type)
)
SELECT day,
       ROUND(list_aggregate(list(term ORDER BY event_type), 'sum'), 8)
           AS kl_divergence
FROM terms
GROUP BY day
ORDER BY day
"""


def source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity monitor: Shannon entropy (nats) of each source's
    language mix, plus its language count — low entropy flags a source
    that collapsed to one language (the upstream-health complement of
    [[drift_kl_daily]]'s day-over-day test). Counts are exact; the only
    float work is one p·ln(p) term per (source, lang) folded in sorted
    language order, so the sum is bit-identical across engines.

    Scale: one count aggregate to |sources|x|langs| cells, then a fold
    over <= |langs| elements per source — nothing scales with rows after
    the map-side-combinable count.
    """
    docs = table(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.groupBy("source").agg(F.sum("n").alias("src_n"))
    terms = cells.join(tot, "source").select(
        "source",
        "lang",
        (
            -(F.col("n") / F.col("src_n"))
            * F.log(F.col("n") / F.col("src_n"))
        ).alias("term"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("lang", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                ),
                8,
            ).alias("lang_entropy"),
        )
        .orderBy("source")
    )


_SOURCE_ENTROPY_SQL = """
WITH cells AS (
    SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
tot AS (SELECT source, SUM(n) AS src_n FROM cells GROUP BY source),
terms AS (
    SELECT c.source, c.lang,
           -(CAST(c.n AS DOUBLE) / t.src_n)
           * LN(CAST(c.n AS DOUBLE) / t.src_n) AS term
    FROM cells c JOIN tot t USING (source)
)
SELECT source,
       COUNT(*) AS n_langs,
       ROUND(list_aggregate(list(term ORDER BY lang), 'sum'), 8)
           AS lang_entropy
FROM terms
GROUP BY source
ORDER BY source
"""


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence test between corpus dimensions: Pearson chi-square
    statistic for the lang x source contingency table — the screening
    monitor for "does some source have a skewed language mix?" (a large
    chi2 means lang and source are entangled and stratified sampling
    must treat them jointly). Counts are exact; expected values and the
    per-cell terms are doubles computed with an identical expression
    shape in both engines and folded in sorted cell order, so the
    statistic is bit-identical.

    Scale: one count aggregate to |langs| x |sources| cells; the margins
    and the fold never scale with rows.
    """
    docs = table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    row_t = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    col_t = cells.groupBy("source").agg(F.sum("o").alias("ct"))
    n_tot = cells.agg(F.sum("o").alias("n_tot"))
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")) / F.col(
        "n_tot"
    ).cast("double")
    terms = (
        cells.join(row_t, "lang")
        .join(col_t, "source")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "lang",
            "source",
            (
                (F.col("o").cast("double") - e)
                * (F.col("o").cast("double") - e)
                / e
            ).alias("term"),
        )
    )
    return terms.agg(
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).alias("dof"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("lang", "source", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            4,
        ).alias("chi2"),
    )


_CHI2_SQL = """
WITH cells AS (
    SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
),
row_t AS (SELECT lang, SUM(o) AS rt FROM cells GROUP BY lang),
col_t AS (SELECT source, SUM(o) AS ct FROM cells GROUP BY source),
n_tot AS (SELECT SUM(o) AS n_tot FROM cells),
terms AS (
    SELECT c.lang, c.source,
           (CAST(o AS DOUBLE)
            - (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) / CAST(n_tot AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) / CAST(n_tot AS DOUBLE))
           / ((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) / CAST(n_tot AS DOUBLE))
               AS term
    FROM cells c
    JOIN row_t USING (lang)
    JOIN col_t USING (source)
    CROSS JOIN n_tot
)
SELECT COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources,
       (COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS dof,
       ROUND(list_aggregate(list(term ORDER BY lang, source), 'sum'), 4)
           AS chi2
FROM terms
"""


def mad_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per language: median document length, the
    median absolute deviation around it, and how many documents fall
    outside median ± 3·MAD — the robust alternative to z-scores
    ([[anomalous_days]]) when the length distribution has heavy tails.
    Two median passes (exact interpolated percentiles) with the per-lang
    statistics broadcast back between them.

    Scale: each pass is one aggregate per lang; the doc-level work is a
    map-side join against a |langs|-row broadcast. Exact medians at
    100 TB would switch to the two-pass bucketed order statistics of
    [[weighted_median_price]] — same output contract.
    """
    docs = table(spark, sf_dir, "documents").select("lang", "n_chars")
    med = docs.groupBy("lang").agg(
        F.median("n_chars").alias("med_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    devs = docs.join(F.broadcast(med), "lang").select(
        "lang",
        "n_chars",
        "med_chars",
        "n_docs",
        F.abs(F.col("n_chars").cast("double") - F.col("med_chars")).alias("dev"),
    )
    mad = devs.groupBy("lang", "med_chars", "n_docs").agg(
        F.median("dev").alias("mad_chars")
    )
    out = (
        devs.select("lang", "dev")
        .join(F.broadcast(mad.select("lang", "mad_chars")), "lang")
        .filter(F.col("dev") > 3.0 * F.col("mad_chars"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        mad.join(out, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.round("med_chars", 2).alias("med_chars"),
            F.round("mad_chars", 2).alias("mad_chars"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
        .orderBy("lang")
    )


_MAD_SQL = """
WITH med AS (
    SELECT lang, median(n_chars) AS med_chars, COUNT(*) AS n_docs
    FROM documents GROUP BY lang
),
devs AS (
    SELECT d.lang, med_chars, n_docs,
           ABS(CAST(n_chars AS DOUBLE) - med_chars) AS dev
    FROM documents d JOIN med USING (lang)
),
mad AS (
    SELECT lang, med_chars, n_docs, median(dev) AS mad_chars
    FROM devs GROUP BY lang, med_chars, n_docs
),
out AS (
    SELECT devs.lang, COUNT(*) AS n_outliers
    FROM devs JOIN mad USING (lang)
    WHERE dev > 3.0 * mad_chars
    GROUP BY devs.lang
)
SELECT lang, n_docs,
       ROUND(med_chars, 2) AS med_chars,
       ROUND(mad_chars, 2) AS mad_chars,
       COALESCE(n_outliers, 0) AS n_outliers
FROM mad LEFT JOIN out USING (lang)
ORDER BY lang
"""


def freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness/staleness monitor: for every event type, the
    last-seen timestamp, its lag behind the newest event anywhere
    (staleness — the "this source stopped flowing" alarm), and how much
    of its traffic arrived in the trailing 7 days. The first page of any
    ingestion dashboard.

    Scale: one combinable max-aggregate to |types| rows; the global
    watermark is a window over that micro-relation (not the fact
    table); the trailing-window count re-aggregates the facts against a
    broadcast per-type dimension — two scans total, zero row-level
    shuffles beyond the combinable aggs.
    """
    events = table(spark, sf_dir, "events").select("event_type", "ts")
    per_type = events.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_total")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dim = per_type.withColumn("g_max", F.max("last_ts").over(wall))
    recent = (
        events.join(F.broadcast(dim.select("event_type", "g_max")), "event_type")
        .filter(F.col("ts") >= F.col("g_max") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_7d"))
    )
    return (
        dim.join(recent, "event_type", "left")
        .select(
            "event_type",
            "last_ts",
            # exact microsecond diff then integer-div: Spark's
            # timestampdiff(SECOND) truncates the elapsed time while
            # DuckDB's date_diff('second') counts boundary crossings —
            # off by one whenever the fractional seconds straddle
            F.expr(
                "timestampdiff(MICROSECOND, last_ts, g_max) div 1000000"
            ).alias("staleness_sec"),
            "n_total",
            F.coalesce("n_7d", F.lit(0)).alias("n_7d"),
            F.expr("coalesce(n_7d, 0) * 10000 div n_total").alias(
                "recent_share_bps"
            ),
        )
        .orderBy("event_type")
    )


_FRESHNESS_SQL = """
WITH per_type AS (
    SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_total
    FROM events GROUP BY event_type
),
dim AS (
    SELECT *, MAX(last_ts) OVER () AS g_max FROM per_type
),
recent AS (
    SELECT e.event_type, COUNT(*) AS n_7d
    FROM events e JOIN dim d USING (event_type)
    WHERE e.ts >= d.g_max - INTERVAL 7 DAY
    GROUP BY e.event_type
)
SELECT event_type, last_ts,
       CAST((epoch_us(g_max) - epoch_us(last_ts)) // 1000000 AS BIGINT)
           AS staleness_sec,
       n_total,
       COALESCE(n_7d, 0) AS n_7d,
       CAST(COALESCE(n_7d, 0) * 10000 // n_total AS BIGINT)
           AS recent_share_bps
FROM dim LEFT JOIN recent USING (event_type)
ORDER BY event_type
"""


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit monitor over order totals: per leading
    digit 1-9, the observed share vs the Benford expectation
    ``log10(1 + 1/d)`` and the chi-square contribution — the classic
    fabricated-data / ETL-corruption screen (a constant-injected or
    truncated feed shows a digit spike immediately).

    Determinism: the leading digit comes from the INTEGER cents string
    (no float log10 near power-of-ten boundaries); shares are one
    rounded division each; the chi-square contribution is a single
    identical double expression per digit row.

    Scale: one map-side-combinable count to 9 cells; everything after
    runs on the 9-row micro-relation.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digits = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("n_total"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.col("n") / F.col("n_total")
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("obs_share"),
            F.round(expected, 6).alias("benford_share"),
            F.round(
                (obs - expected) * (obs - expected) / expected * F.col("n_total"),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_BENFORD_SQL = """
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                       1, 1) AS INTEGER) AS digit,
           COUNT(*) AS n
    FROM orders WHERE o_totalprice > 0
    GROUP BY 1
),
tot AS (SELECT SUM(n) AS n_total FROM digits)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / n_total, 6) AS obs_share,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share,
       ROUND((CAST(n AS DOUBLE) / n_total - LOG10(1.0 + 1.0 / digit))
             * (CAST(n AS DOUBLE) / n_total - LOG10(1.0 + 1.0 / digit))
             / LOG10(1.0 + 1.0 / digit) * n_total, 4) AS chi2_term
FROM digits CROSS JOIN tot
ORDER BY digit
"""


_KS_BUCKET = 1_000_000  # cents per rank bucket (values ~0..6e7 cents)
_KS_CRIT = 1.358  # alpha = 0.05 two-sample critical coefficient


def _pooled_value_cums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scaffold for the two-sample tests over finished ('F') vs
    open ('O') order totals: one row per distinct integer-cents value
    with per-group counts (d1, d2) and INCLUSIVE cumulative counts
    (c1, c2) in value order — computed with the distributed-rank
    rewrite (value-range buckets, micro-relation prefix sums,
    within-bucket windows), never a single-partition sweep."""
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select(
            cents.alias("v"),
            (F.col("o_orderstatus") == "F").cast("int").alias("is1"),
        )
    )
    per_value = orders.groupBy("v").agg(
        F.sum("is1").alias("d1"),
        F.sum(1 - F.col("is1")).alias("d2"),
    )
    pb = (F.col("v") - F.pmod(F.col("v"), _KS_BUCKET)) / _KS_BUCKET
    pv = per_value.withColumn("pb", pb.cast("long"))
    bucket = pv.groupBy("pb").agg(
        F.sum("d1").alias("b1"), F.sum("d2").alias("b2")
    )
    w_off = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, -1)
    offs = bucket.select(
        "pb",
        F.coalesce(F.sum("b1").over(w_off), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("b2").over(w_off), F.lit(0)).alias("o2"),
    )
    w_in = (
        Window.partitionBy("pb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pv.join(F.broadcast(offs), "pb").select(
        "v",
        "d1",
        "d2",
        (F.col("o1") + F.sum("d1").over(w_in)).alias("c1"),
        (F.col("o2") + F.sum("d2").over(w_in)).alias("c2"),
    )


def ks_test_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distribution compare: is the
    order-total distribution of finished ('F') orders the same as open
    ('O') ones? D = sup|F1 - F2| over the pooled sample, with the
    alpha=0.05 decision ``D > c * sqrt((n1+n2)/(n1*n2))`` — the
    distribution-drift monitor that catches shape changes mean/variance
    monitors miss.

    Exactness: the supremum is computed on INTEGERS — at each distinct
    value, ``|c1*n2 - c2*n1|`` (cross-multiplied cumulative counts,
    decimal128 so 1e12-row samples cannot overflow) — and only the
    final max is divided once; sqrt is the one cross-engine-stable
    power function.

    Scale: cumulative counts use the distributed-rank rewrite, not a
    global window — per-value counts bucket by value range, bucket
    subtotals prefix-sum on the ~|buckets| micro-relation, and the
    within-bucket cumsum windows partition BY BUCKET. One shuffle on
    value, one on bucket; nothing funnels through a single partition.
    """
    pooled = _pooled_value_cums(spark, sf_dir)
    tot = pooled.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    cum = (
        pooled.crossJoin(F.broadcast(tot))
        .select(
            # (19,0) x (19,0) -> (38,0): exact up to 1e12-row samples on
            # both engines (DuckDB cannot widen past 38, so the factors
            # must be 19-wide, not 38-wide)
            F.abs(
                F.col("c1").cast("decimal(19,0)")
                * F.col("n2").cast("decimal(19,0)")
                - F.col("c2").cast("decimal(19,0)")
                * F.col("n1").cast("decimal(19,0)")
            ).alias("num"),
            "n1",
            "n2",
        )
    )
    d_stat = F.col("max_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2")
    )
    crit = F.lit(_KS_CRIT) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return (
        cum.groupBy("n1", "n2")
        .agg(F.max("num").alias("max_num"))
        .select(
            F.col("n1").alias("n_finished"),
            F.col("n2").alias("n_open"),
            F.round(d_stat, 6).alias("ks_stat"),
            F.round(crit, 6).alias("crit_05"),
            (d_stat > crit).alias("distributions_differ"),
        )
    )


_KS_SQL = f"""
WITH orders2 AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is1
    FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_value AS (
    SELECT v, SUM(is1) AS d1, SUM(1 - is1) AS d2
    FROM orders2 GROUP BY v
),
tot AS (SELECT SUM(d1) AS n1, SUM(d2) AS n2 FROM per_value),
cum AS (
    SELECT v,
           SUM(d1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
           SUM(d2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
    FROM per_value
),
stat AS (
    SELECT MAX(ABS(CAST(c1 AS DECIMAL(19,0)) * CAST(t.n2 AS DECIMAL(19,0))
                   - CAST(c2 AS DECIMAL(19,0)) * CAST(t.n1 AS DECIMAL(19,0))))
               AS max_num,
           t.n1, t.n2
    FROM cum CROSS JOIN tot t
    GROUP BY t.n1, t.n2
)
SELECT CAST(n1 AS BIGINT) AS n_finished,
       CAST(n2 AS BIGINT) AS n_open,
       ROUND(CAST(max_num AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_stat,
       ROUND({_KS_CRIT} * SQRT(CAST(n1 + n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2)), 6) AS crit_05,
       CAST(max_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
           > {_KS_CRIT} * SQRT(CAST(n1 + n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * n2)) AS distributions_differ
FROM stat
"""


_MW_CRIT = 1.96  # alpha = 0.05 two-sided normal critical value


def mannwhitney_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on the same finished-vs-open order
    totals as [[ks_test_order_status]] — the location-shift
    complement to KS's any-shape-difference test (together, the
    standard nonparametric pair). Ties take AVERAGE ranks with the
    standard tie-corrected normal approximation.

    Exactness: doubled rank sums stay INTEGER (the average rank of a
    tie run is a half-integer, so 2x is exact in decimal128), as do the
    tie-correction Σ(t³-t) and all counts; the z-score is one closing
    double expression identical on both engines.

    Scale: rides the same distributed cumulative-rank scaffold as KS —
    per-value counts, bucket prefix sums, within-bucket windows; the
    final statistic is one combinable aggregate.
    """
    pooled = _pooled_value_cums(spark, sf_dir)
    cnt = F.col("d1") + F.col("d2")
    cum_before = F.col("c1") + F.col("c2") - cnt
    # 2 * average pooled rank of the value's tie run (exact integer)
    two_avg_rank = 2 * cum_before + cnt + 1
    terms = pooled.select(
        "d1",
        "d2",
        (F.col("d1").cast("decimal(19,0)") * two_avg_rank.cast("decimal(19,0)"))
        .alias("two_r1_term"),
        (cnt.cast("decimal(19,0)") * cnt * cnt - cnt).alias("tie_term"),
    )
    sums = terms.agg(
        F.sum("d1").alias("n1"),
        F.sum("d2").alias("n2"),
        F.sum("two_r1_term").cast("decimal(38,0)").alias("two_r1"),
        F.sum("tie_term").cast("decimal(38,0)").alias("tie_sum"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    two_u1 = F.col("two_r1").cast("double") - n1d * (n1d + 1)
    mean2 = n1d * n2d  # 2 * mu_U
    var_u = (
        n1d * n2d / 12.0
        * ((nd + 1) - F.col("tie_sum").cast("double") / (nd * (nd - 1)))
    )
    z = (two_u1 - mean2) / (F.lit(2.0) * F.sqrt(var_u))
    return sums.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.col("n1").alias("n_finished"),
        F.col("n2").alias("n_open"),
        (F.col("two_r1").cast("double") / 2.0).alias("rank_sum_f"),
        F.round((two_u1 / 2.0), 1).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > _MW_CRIT).alias("location_shift"),
    )


_MW_SQL = f"""
WITH orders2 AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is1
    FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_value AS (
    SELECT v, SUM(is1) AS d1, SUM(1 - is1) AS d2
    FROM orders2 GROUP BY v
),
cum AS (
    SELECT d1, d2, d1 + d2 AS cnt,
           SUM(d1 + d2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (d1 + d2) AS cum_before
    FROM per_value
),
sums AS (
    SELECT SUM(d1) AS n1, SUM(d2) AS n2,
           CAST(SUM(CAST(d1 AS DECIMAL(19,0))
                * CAST(2 * cum_before + cnt + 1 AS DECIMAL(19,0)))
             AS DECIMAL(38,0)) AS two_r1,
           CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * cnt * cnt - cnt)
             AS DECIMAL(38,0)) AS tie_sum
    FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n_finished,
       CAST(n2 AS BIGINT) AS n_open,
       CAST(two_r1 AS DOUBLE) / 2.0 AS rank_sum_f,
       ROUND((CAST(two_r1 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2.0, 1)
           AS u_stat,
       ROUND(((CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
              - CAST(n1 AS DOUBLE) * n2)
             / (2.0 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                * ((CAST(n1 AS DOUBLE) + n2 + 1)
                   - CAST(tie_sum AS DOUBLE)
                     / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))),
             6) AS z_score,
       ABS(((CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
            - CAST(n1 AS DOUBLE) * n2)
           / (2.0 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
              * ((CAST(n1 AS DOUBLE) + n2 + 1)
                 - CAST(tie_sum AS DOUBLE)
                   / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))))
           > {_MW_CRIT} AS location_shift
FROM sums
WHERE n1 > 0 AND n2 > 0
"""


QUERIES = {
    "profile_table": profile_table,
    "benford_first_digit": benford_first_digit,
    "ks_test_order_status": ks_test_order_status,
    "mannwhitney_order_status": mannwhitney_order_status,
    "freshness_report": freshness_report,
    "quality_report_event": quality_report_event,
    "quality_report_customer": quality_report_customer,
    "quality_quarantine_customer": quality_quarantine_customer,
    "drift_kl_daily": drift_kl_daily,
    "source_entropy": source_entropy,
    "chi2_lang_source": chi2_lang_source,
    "mad_outlier_docs": mad_outlier_docs,
}

ORACLES = {
    "profile_table": _profile_oracle(),
    "benford_first_digit": _BENFORD_SQL,
    "ks_test_order_status": _KS_SQL,
    "mannwhitney_order_status": _MW_SQL,
    "freshness_report": _FRESHNESS_SQL,
    "quality_report_event": _event_report_oracle(),
    "quality_report_customer": _report_oracle(),
    "quality_quarantine_customer": _quarantine_oracle(),
    "drift_kl_daily": _DRIFT_SQL,
    "source_entropy": _SOURCE_ENTROPY_SQL,
    "chi2_lang_source": _CHI2_SQL,
    "mad_outlier_docs": _MAD_SQL,
}
