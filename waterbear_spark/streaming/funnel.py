"""Batch/stream polymorphic quality-gate funnel (round 7): the
incremental twin of ``queries/wave18.quality_gate_funnel``.

The batch catalog query computes the per-document top-token count with
an explode + two keyed aggregations — the right shape for a one-shot
100 TB scan, but it would chain THREE stateful aggregations in a
stream, which Structured Streaming's complete-mode planner rejects.
Here the top-token count folds row-locally instead
(``array_max(transform(array_distinct(toks), t -> count of t))`` —
O(unique x len) per document, bounded by the document itself), so the
whole funnel is one stateless projection followed by exactly ONE global
streaming aggregation: each micro-batch updates six running counters
(docs seen + survivors of gate prefixes 1..5), and the census relation
is re-emitted in ``complete`` output mode. Batch backfill == incremental
run — the Kappa contract, proven by
``tests/test_streaming_funnel.py`` (stream over a JSON file source with
``Trigger.AvailableNow`` must equal the batch catalog query's frame
exactly).

Gate semantics are shared by construction: every threshold and band
multiplier (``_MIN_CHARS``/``_WLEN_LO``/``_WLEN_HI``/``_STOP_X``/
``_REP_X``/``_STOPWORDS``/``_LANG_OK``) is imported from ``wave18`` —
tuning a gate there retunes this twin in the same commit — and every
comparison is the same integer cross-multiplication (never a float
ratio). Only the top-token MECHANISM differs (row-local sorted
run-length here vs explode + groupBy there), a documented scale trade
with identical values, pinned by the equality tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterbear_spark.queries.wave18 import (
    _LANG_OK,
    _MIN_CHARS,
    _REP_X,
    _STOP_X,
    _STOPWORDS,
    _WLEN_HI,
    _WLEN_LO,
)

_GATES = [
    "len_floor",
    "word_len_band",
    "stopword_floor",
    "repetition_cap",
    "lang_whitelist",
]


def _top_token_count(toks: Column) -> Column:
    """Row-local per-document mode count: sort the tokens, then one
    run-length fold tracks (previous token, current run, best run) —
    O(len log len) per document, never the O(distinct x len) of a
    naive per-distinct recount (a 200k-token mostly-unique crawl
    artifact would cost ~4e10 comparisons and stall its micro-batch).
    Equals the batch path's explode + groupBy mode exactly; 0 for
    token-less documents."""
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.coalesce(run, F.lit(0))


def funnel_flags(docs: DataFrame) -> DataFrame:
    """Stateless per-document gate flags (g1..g5) for a
    ``(doc_id, text, lang, n_chars)`` relation — batch or stream."""
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    d = (
        docs.withColumn("toks", toks)
        .withColumn("cnt", F.size("toks"))
        .withColumn(
            "sumlen",
            F.aggregate("toks", F.lit(0), lambda acc, t: acc + F.length(t)),
        )
        .withColumn("stop", F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS))))
        .withColumn("topcnt", _top_token_count(F.col("toks")))
    )
    return d.select(
        (F.col("n_chars") >= _MIN_CHARS).alias("g1"),
        (
            (_WLEN_LO * F.col("cnt") <= F.col("sumlen"))
            & (F.col("sumlen") <= _WLEN_HI * F.col("cnt"))
        ).alias("g2"),
        (_STOP_X * F.col("stop") >= F.col("cnt")).alias("g3"),
        (_REP_X * F.col("topcnt") <= F.col("cnt")).alias("g4"),
        F.col("lang").isin(*_LANG_OK).alias("g5"),
    )


def funnel_census(docs: DataFrame) -> DataFrame:
    """The 5-row gate-attrition census (gate_idx, gate, n_in, n_fail,
    n_out) over a documents relation — the same ROWS as the batch
    catalog query ``quality_gate_funnel``, compared order-insensitively:
    ``gate_idx`` is in the output, but this function deliberately omits
    an ``orderBy`` so the one plan serves both batch and streaming
    callers (comparisons must sort on gate_idx first, as the equality
    tests do). Streamable in ``complete`` output mode with a single
    stateful aggregation."""
    flags = funnel_flags(docs)
    cum = [F.lit(True)]
    for i in range(5):
        cum.append(cum[-1] & F.col(f"g{i + 1}"))
    agg = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        *[F.sum(cum[i + 1].cast("long")).alias(f"s{i + 1}") for i in range(5)],
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("gate_idx"),
                F.lit(_GATES[i]).alias("gate"),
                F.col(f"s{i}").alias("n_in"),
                (F.col(f"s{i}") - F.col(f"s{i + 1}")).alias("n_fail"),
                F.col(f"s{i + 1}").alias("n_out"),
            )
            for i in range(5)
        ]
    )
    return agg.select(F.explode(stages).alias("st")).select(
        "st.gate_idx", "st.gate", "st.n_in", "st.n_fail", "st.n_out"
    )
