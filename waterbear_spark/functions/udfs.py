"""Pandas UDF surface (SURVEY.md §2b "UDF surface"): scalar pandas UDF,
grouped-map ``applyInPandas``, grouped-agg pandas UDF.

Policy: built-in functions are ALWAYS preferred (every operator in the
query catalog is UDF-free); this module exists for logic that genuinely
needs Python — numpy/scipy models, tokenizers, image codecs. Everything
here is Arrow-batched (vectorized columnar transfer, ~10-100x faster than
row-at-a-time Python UDFs); nothing is per-row Python.

Scale notes: a scalar pandas UDF streams Arrow batches through the Python
worker with no shuffle; ``applyInPandas`` shuffles once on the group key
and requires each group to fit in one worker's memory — keep groups
bounded (salt oversized keys upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

# NB: DataType instances, not DDL strings — DDL parsing at decoration time
# requires an active SparkSession, which breaks importability


@pandas_udf(ArrayType(DoubleType()))
def normalize_embedding(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2-normalize an embedding column.

    (Expressible natively with aggregate/transform — kept as the canonical
    scalar-UDF example; the native variant lives in queries/llm.py.)
    """
    def norm(arr):
        a = np.asarray(arr, dtype=np.float64)
        n = np.linalg.norm(a)
        return (a / n).tolist() if n > 0 else a.tolist()

    return v.map(norm)


@pandas_udf(DoubleType())
def median_grouped_agg(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact median (no native exact-median
    aggregate exists in Spark; percentile_approx is the sketch variant)."""
    return float(v.median())


def zscore_by_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Grouped-map ``applyInPandas``: z-score of ``value_col`` within each
    group (sample stddev, ddof=1). One shuffle on the group key; each
    group is handed to Python as a single Arrow-backed pandas frame.
    """
    # copy, don't .add() in place — df.schema returns the dataframe's
    # cached StructType, and mutating it corrupts column resolution
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        if std and std > 0:
            pdf[out_col] = ((pdf[value_col] - mean) / std).round(4)
        else:
            pdf[out_col] = 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(compute, schema=out_schema)


def median_chars_by_lang(spark, sf_dir: str) -> DataFrame:
    """Catalog query: exact median of n_chars per language via the
    grouped-agg pandas UDF (oracle: DuckDB MEDIAN)."""
    from waterbear_spark.queries.tables import table

    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(median_grouped_agg(F.col("n_chars").cast("double")).alias("median_chars"))
        .orderBy("lang")
    )


MEDIAN_CHARS_SQL = """
SELECT lang, MEDIAN(CAST(n_chars AS DOUBLE)) AS median_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def zscore_chars(spark, sf_dir: str) -> DataFrame:
    """Catalog query: per-language z-score of document length via
    applyInPandas (oracle: window AVG/STDDEV_SAMP)."""
    from waterbear_spark.queries.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        zscore_by_group(docs, "lang", "n_chars")
        .select("doc_id", "lang", "n_chars", "zscore")
        .orderBy("doc_id")
    )


ZSCORE_CHARS_SQL = """
SELECT doc_id, lang, n_chars,
       CASE WHEN STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) > 0
            THEN ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                       / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4)
            ELSE 0.0
       END AS zscore
FROM documents
ORDER BY doc_id
"""

class TokenizeOffsets:
    """Python UDTF (Spark 4 table function): expand each document into
    (pos, token) rows — one-to-many generation with per-row Python
    logic, the escape hatch for tokenizers that built-in generators
    can't express (a real BPE encoder drops in here unchanged).

    The tokenization mirrors the engine-wide contract (lowercase,
    whitespace split, empties dropped) so the DuckDB lateral-unnest
    oracle checks it exactly.
    """

    def eval(self, doc_id: int, text: str):
        pos = 0
        for tok in text.lower().split():
            if tok:
                pos += 1
                yield doc_id, pos, tok


def udtf_tokenize(spark, sf_dir: str) -> DataFrame:
    """Catalog query: LATERAL UDTF expansion of documents into token
    streams (bounded to the first 100 docs — row-wise Python is the
    slow path; the catalog keeps its footprint small)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, LongType, StringType

    from waterbear_spark.queries.tables import table

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("token", StringType()),
        ]
    )
    spark.udtf.register("tokenize_offsets", udtf(TokenizeOffsets, returnType=schema))
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs_src")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM udtf_docs_src, LATERAL tokenize_offsets(doc_id, text) t
        ORDER BY t.doc_id, t.pos
        """
    )


UDTF_TOKENIZE_SQL = """
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
    FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(i AS INTEGER) AS pos, toks[i] AS token
FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) gs
ORDER BY doc_id, pos
"""


QUERIES = {
    "pandas_median_chars": median_chars_by_lang,
    "pandas_zscore_chars": zscore_chars,
    # udtf_* exercises the Python UDTF surface (same carve-out as pandas_*)
    "udtf_tokenize": udtf_tokenize,
}

ORACLES = {
    "pandas_median_chars": MEDIAN_CHARS_SQL,
    "pandas_zscore_chars": ZSCORE_CHARS_SQL,
    "udtf_tokenize": UDTF_TOKENIZE_SQL,
}
