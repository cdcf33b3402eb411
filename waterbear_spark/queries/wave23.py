"""Round-7 wave-23 operators: curation-knob sweeps and corpus entropy.

* ``length_filter_sweep`` — threshold-sensitivity table for the length
  gate: at min-chars thresholds {100, 200, 400, 800}, how many documents
  and characters survive (count + exact basis-point share). The table an
  engineer reads before pinning [[quality_gate_funnel]]'s len_floor —
  computed as ONE conditional aggregation over one scan, exploded to a
  4-row relation (no per-threshold rescans).
* ``padding_waste_sweep`` — the complement of [[sequence_packing]]: if
  documents are NOT packed, each doc pads up to ceil(n_toks/L) sequences
  of length L; for L in {512, 1024, 2048} report sequences, padded
  tokens, and waste in basis points — the table that justifies running
  the packer at a given context length. Per-document integer ceil-div,
  one conditional aggregation.
* ``unigram_entropy_by_source`` — per-source corpus entropy (nats) of
  the unigram distribution, H = ln(T) - (sum_tok c*ln c)/T, plus the
  normalized efficiency H/ln(n_types) — the classic corpus-diversity /
  degenerate-source signal (a crawler stuck on one page collapses H).
  Per-type ln(c) is quantized to micro-nat fixed point
  (floor(ln(c)*1e6 + .5), the [[perplexity_buckets]] idiom), multiplied
  by the integer count and integer-summed, so the only float summation
  forbidden by the house rules never happens; the two final divisions
  are exact-integer-over-integer doubles, identical on both engines.

Scale: the sweeps are single scans with row-local integer arithmetic
and 1-row aggregates; the entropy is one (source, token) aggregation —
vocabulary-shaped, never a pair space. Nothing collects, nothing loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.llm import TOKENS_SQL, _tokens
from waterbear_spark.queries.tables import table

_LEN_THRESHOLDS = (100, 200, 400, 800)
_SEQ_LENS = (512, 1024, 2048)
_ENT_FP = 1_000_000  # micro-nats


def length_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs/chars surviving each min-chars threshold — see module
    docstring. Output: (min_chars, docs_kept, docs_bp, chars_kept,
    chars_bp)."""
    docs = table(spark, sf_dir, "documents").select("n_chars")
    agg = docs.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_chars").alias("nc"),
        *[
            F.sum(F.when(F.col("n_chars") >= t, 1).otherwise(0)).alias(f"d{t}")
            for t in _LEN_THRESHOLDS
        ],
        *[
            F.sum(
                F.when(F.col("n_chars") >= t, F.col("n_chars")).otherwise(0)
            ).alias(f"c{t}")
            for t in _LEN_THRESHOLDS
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("min_chars"),
                F.col(f"d{t}").alias("docs_kept"),
                F.expr(f"(d{t} * 10000) div nd").alias("docs_bp"),
                F.col(f"c{t}").alias("chars_kept"),
                F.expr(f"(c{t} * 10000) div nc").alias("chars_bp"),
            )
            for t in _LEN_THRESHOLDS
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.min_chars", "r.docs_kept", "r.docs_bp", "r.chars_kept", "r.chars_bp"
    )


LENGTH_SWEEP_SQL = f"""
WITH agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(n_chars) AS BIGINT) AS nc,
           {", ".join(
               f"CAST(SUM(CASE WHEN n_chars >= {t} THEN 1 ELSE 0 END) AS BIGINT)"
               f" AS d{t}, "
               f"CAST(SUM(CASE WHEN n_chars >= {t} THEN n_chars ELSE 0 END)"
               f" AS BIGINT) AS c{t}"
               for t in _LEN_THRESHOLDS
           )}
    FROM documents
)
{" UNION ALL ".join(
    f"SELECT {t} AS min_chars, d{t} AS docs_kept,"
    f" (d{t} * 10000) // nd AS docs_bp,"
    f" c{t} AS chars_kept, (c{t} * 10000) // nc AS chars_bp FROM agg"
    for t in _LEN_THRESHOLDS
)}
"""


def padding_waste_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpacked padding waste per context length — see module docstring.
    Output: (seq_len, n_docs, total_tokens, n_seqs, padded_tokens,
    waste_bp)."""
    docs = table(spark, sf_dir, "documents").select(
        F.size(_tokens(F.col("text"))).alias("n_toks")
    ).filter(F.col("n_toks") > 0)
    agg = docs.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_toks").alias("tt"),
        *[
            F.sum(F.expr(f"(n_toks + {L - 1}) div {L}")).alias(f"s{L}")
            for L in _SEQ_LENS
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(L).alias("seq_len"),
                F.col("nd").alias("n_docs"),
                F.col("tt").alias("total_tokens"),
                F.col(f"s{L}").alias("n_seqs"),
                (F.col(f"s{L}") * L - F.col("tt")).alias("padded_tokens"),
                F.expr(f"((s{L} * {L} - tt) * 10000) div (s{L} * {L})").alias(
                    "waste_bp"
                ),
            )
            for L in _SEQ_LENS
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.seq_len",
        "r.n_docs",
        "r.total_tokens",
        "r.n_seqs",
        "r.padded_tokens",
        "r.waste_bp",
    )


PADDING_WASTE_SQL = f"""
WITH d AS (
    SELECT len({TOKENS_SQL}) AS n_toks FROM documents
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(n_toks) AS BIGINT) AS tt,
           {", ".join(
               f"CAST(SUM((n_toks + {L - 1}) // {L}) AS BIGINT) AS s{L}"
               for L in _SEQ_LENS
           )}
    FROM d WHERE n_toks > 0
)
{" UNION ALL ".join(
    f"SELECT {L} AS seq_len, nd AS n_docs, tt AS total_tokens,"
    f" s{L} AS n_seqs, s{L} * {L} - tt AS padded_tokens,"
    f" ((s{L} * {L} - tt) * 10000) // (s{L} * {L}) AS waste_bp FROM agg"
    for L in _SEQ_LENS
)}
"""


def unigram_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram entropy in nats + normalized efficiency — see
    module docstring. Output: (source, n_types, n_tokens, entropy_nats,
    efficiency)."""
    tf = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # c * ln(c)-in-micro-nats sums as DECIMAL(38,0): at 100 TB scale the
    # per-type product alone can pass 2^63 (c ~ 1e12, ln_fp ~ 3e7), and
    # Spark's non-ANSI long sum would wrap silently while DuckDB's
    # HUGEINT would not — decimal keeps both engines exact and identical
    per_src = tf.select(
        "source",
        "c",
        (
            F.col("c").cast("decimal(38,0)")
            * F.floor(F.log("c") * _ENT_FP + F.lit(0.5)).cast("long")
        ).alias("clc_fp"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("t"),
        F.sum("clc_fp").alias("s_fp"),
    )
    h = (
        F.floor(F.log("t") * _ENT_FP + F.lit(0.5)).cast("long").cast("double")
        - F.col("s_fp").cast("double") / F.col("t")
    ) / _ENT_FP
    return per_src.select(
        "source",
        F.col("n_types").cast("long"),
        F.col("t").cast("long").alias("n_tokens"),
        F.round(h, 4).alias("entropy_nats"),
        F.when(
            F.col("n_types") > 1, F.round(h / F.log("n_types"), 4)
        ).alias("efficiency"),
    ).orderBy("source")


UNIGRAM_ENTROPY_SQL = f"""
WITH tf AS (
    SELECT source, tok, COUNT(*) AS c
    FROM (SELECT source, unnest({TOKENS_SQL}) AS tok FROM documents)
    GROUP BY source, tok
),
per_src AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS t,
           -- DECIMAL(38,0) sum: see the Spark twin's overflow note
           SUM(CAST(c AS DECIMAL(38,0))
               * CAST(FLOOR(ln(c) * {_ENT_FP} + 0.5) AS BIGINT)) AS s_fp
    FROM tf GROUP BY source
)
SELECT source, n_types, t AS n_tokens,
       ROUND((CAST(FLOOR(ln(t) * {_ENT_FP} + 0.5) AS BIGINT)
              - CAST(s_fp AS DOUBLE) / t) / {_ENT_FP}, 4) AS entropy_nats,
       CASE WHEN n_types > 1 THEN
            ROUND(((CAST(FLOOR(ln(t) * {_ENT_FP} + 0.5) AS BIGINT)
                    - CAST(s_fp AS DOUBLE) / t) / {_ENT_FP}) / ln(n_types), 4)
       END AS efficiency
FROM per_src
ORDER BY source
"""


QUERIES = {
    "length_filter_sweep": length_filter_sweep,
    "padding_waste_sweep": padding_waste_sweep,
    "unigram_entropy_by_source": unigram_entropy_by_source,
}

ORACLES = {
    "length_filter_sweep": LENGTH_SWEEP_SQL,
    "padding_waste_sweep": PADDING_WASTE_SQL,
    "unigram_entropy_by_source": UNIGRAM_ENTROPY_SQL,
}
