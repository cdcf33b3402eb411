"""Training-corpus preparation operators: context-window sequence
packing and language-balanced resampling.

These are the steps between a cleaned corpus and a training run: packing
documents into fixed-token-budget sequences (concat-and-chunk, the
standard pretraining batch prep) and rebalancing the language mix with a
deterministic, reproducible sample. Both are pure Catalyst — windows and
aggregates, no UDFs — and both carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.llm import TOKENS_SQL, _tokens
from waterbear_spark.queries.tables import table

_PACK_BUDGET = 512  # tokens per packed training sequence


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    per source (deterministic doc_id order) and every document is
    assigned to the ``_PACK_BUDGET``-token bin its first token lands in —
    the packing layout GPT-style pretraining uses to fill context
    windows without padding. Output: per (source, bin) document and
    token counts, i.e. the packing manifest a loader would consume.

    Scale: one shuffle on ``source``, a running sum within each source
    partition, then a bounded aggregate. At 100 TB the packing domain
    key becomes (source, shard) so no single window sees unbounded rows;
    the layout stays byte-deterministic because order is (doc_id), not
    arrival. No pair space, no Python.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("tok_n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn(
        "bin",
        F.floor((F.sum("tok_n").over(w) - F.col("tok_n")) / F.lit(float(_PACK_BUDGET))).cast(
            "long"
        ),
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_n").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "bin")
    )


SEQUENCE_PACKING_SQL = f"""
WITH tok AS (
    SELECT doc_id, source, len({TOKENS_SQL}) AS tok_n FROM documents
),
laid AS (
    SELECT source, doc_id, tok_n,
           SUM(tok_n) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM tok
)
SELECT source,
       CAST(FLOOR((cum - tok_n) / {float(_PACK_BUDGET)}) AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(tok_n) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc
FROM laid
GROUP BY source, bin
ORDER BY source, bin
"""


def lang_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced downsampling: every language is cut to the
    smallest language's document count, membership chosen by md5(doc_id)
    rank — a reproducible, engine-independent lottery (the same trick as
    [[deterministic_split]]). Output: per language, corpus count before,
    kept count, and the sum of kept doc_ids — the checksum pins the
    exact membership, so the oracle certifies WHICH documents were kept,
    not just how many.

    Scale: ranking is one shuffle on ``lang`` (a bounded-cardinality
    key); the per-lang floor is a broadcast 1-row scalar. Rows never
    collect; the md5 rank makes the sample stable under any partitioning
    or cluster size.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    floor_n = per_lang.agg(F.min("n_before").alias("n_keep"))

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(w)).crossJoin(
        F.broadcast(floor_n)
    )
    kept = ranked.filter(F.col("rn") <= F.col("n_keep")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_checksum"),
    )
    return (
        per_lang.join(kept, "lang")
        .select("lang", "n_before", "n_kept", "kept_checksum")
        .orderBy("lang")
    )


LANG_BALANCE_SQL = """
WITH per_lang AS (
    SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang
),
floor_n AS (SELECT MIN(n_before) AS n_keep FROM per_lang),
ranked AS (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
    FROM documents
)
SELECT p.lang,
       p.n_before,
       COUNT(*) AS n_kept,
       CAST(SUM(r.doc_id) AS BIGINT) AS kept_checksum
FROM ranked r
JOIN per_lang p ON p.lang = r.lang
CROSS JOIN floor_n f
WHERE r.rn <= f.n_keep
GROUP BY p.lang, p.n_before
ORDER BY p.lang
"""


QUERIES = {
    "sequence_packing": sequence_packing,
    "lang_balance_resample": lang_balance_resample,
}

ORACLES = {
    "sequence_packing": SEQUENCE_PACKING_SQL,
    "lang_balance_resample": LANG_BALANCE_SQL,
}
