"""Text-retrieval operators over ``documents``: BM25 ranked search and
inverted-index posting-list construction.

These complete the retrieval story started by ``textops.tfidf_top_terms``
(keyword extraction): an actual *ranked search* against a fixed query
(Okapi BM25, the lexical-retrieval baseline every RAG/data-curation
pipeline keeps next to its embedding ANN path), and the physical index
artifact a search engine would build from the corpus (term -> postings).
Everything is exact, UDF-free Catalyst; float determinism follows the
house rules in ``tables.py`` (per-term doubles are computed by an
identical expression tree on both engines, then exact-decimal-summed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.llm import TOKENS_SQL, _tokens
from waterbear_spark.queries.tables import table

# fixed lexical query for the BM25 demo (terms exist in the synthetic
# corpus vocabulary); at scale the query side is always a broadcast of
# a handful of terms, so the constant-ness is representative
_BM25_QUERY = ("spark", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10

# posting lists are capped: at web-corpus scale the head of the Zipf
# distribution ("the") would otherwise materialize a posting list the
# size of the corpus in one row. Real index builders shard/cap segments
# the same way.
_POSTINGS_CAP = 40


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval: top-10 documents for a fixed 3-term
    lexical query. Per-term score is
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the
    Robertson-Sparck-Jones idf ``ln(1 + (N - df + .5)/(df + .5))``
    (the +1 form, always positive).

    Determinism: tf/df/dl/N are exact integers; avgdl is one exact
    decimal sum divided once. Each per-term score is a double produced
    by the same expression tree on both engines (bit-identical), rounded
    to 6 before an exact decimal sum across the <=3 query terms, so the
    final score carries no float-order dependence.

    Scale: exactly TWO corpus scans — one tiny (N, avgdl) aggregate and
    one token explode that filters to the query terms BEFORE the
    aggregate (the corpus reduces to |query| x |matching docs| rows
    immediately, carrying each doc's length alongside so no join back to
    a corpus-sized dl relation is needed). df derives from the tf
    relation, not a third scan; df and the avgdl/N scalars are
    broadcast; the top-k is a ``TakeOrderedAndProject``, never a global
    sort. At 100 TB the (N, avgdl) scan is the kind of corpus statistic
    an index would maintain incrementally.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    # corpus scalars: N and avgdl (exact decimal sum -> one division)
    scal = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size("toks").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    qterms = list(_BM25_QUERY)
    hits = (
        docs.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .filter(F.col("term").isin(qterms))
    )
    # dl is constant per doc, so min() just carries it through the agg
    tf = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl")
    )
    # df = docs containing the term = tf's per-term row count (no rescan)
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = F.round(idf * F.col("tf") * (k1 + 1) / denom, 6)
    return (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            term_score.cast("decimal(20,6)").alias("ts_"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum("ts_"), 4).cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY)

BM25_SEARCH_SQL = f"""
WITH docs AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
scal AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CAST(dl AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
hits AS (
    SELECT doc_id, unnest(toks) AS term FROM docs
),
qhits AS (SELECT * FROM hits WHERE term IN ({_BM25_TERMS_SQL})),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM qhits GROUP BY doc_id, term
),
df AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM qhits) GROUP BY term
),
scored AS (
    SELECT tf.doc_id,
           CAST(ROUND(
               LN(1.0 + (scal.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / scal.avgdl)), 6)
             AS DECIMAL(20,6)) AS ts_
    FROM tf
    JOIN df USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN scal
)
SELECT doc_id, COUNT(*) AS n_terms_hit,
       CAST(ROUND(SUM(ts_), 4) AS DOUBLE) AS score
FROM scored
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {_BM25_TOPK}
"""


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, the document frequency and a
    capped, sorted posting list of ``doc:first_position`` entries (the
    artifact a lexical search engine materializes from the corpus).
    Postings are zero-padded strings so lexicographic order == numeric
    order and the list is engine-exact.

    Scale: one explode shuffle to (term, doc) with the first position
    taken by ``min`` (map-side combinable); posting lists aggregate per
    term and are CAPPED at {cap} entries — the Zipf head ("the") never
    materializes a corpus-sized row. Real index builders shard exactly
    this way; df stays the full count.

    The posting list is serialized with ``array_join`` to one
    comma-delimited string (r5 verdict fix: the driver's hash harness
    cannot hash array columns; the values are unchanged).
    """
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "term")
    )
    first_pos = toks.groupBy("term", "doc_id").agg(
        (F.min("pos") + 1).alias("fpos")  # 1-based, mirrors the oracle
    )
    posting = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 8, "0"),
        F.lit(":"),
        F.lpad(F.col("fpos").cast("string"), 5, "0"),
    )
    return (
        first_pos.select("term", posting.alias("p"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("p")), 1, _POSTINGS_CAP),
                ",",
            ).alias("postings"),
        )
        .orderBy("term")
    )

inverted_index_postings.__doc__ = inverted_index_postings.__doc__.format(cap=_POSTINGS_CAP)


INVERTED_INDEX_SQL = f"""
WITH docs AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
),
toks AS (
    -- parallel unnests in one SELECT zip positionally in DuckDB
    SELECT doc_id, unnest(toks) AS term,
           unnest(generate_series(1, len(toks))) AS pos
    FROM docs
),
first_pos AS (
    SELECT term, doc_id, MIN(pos) AS fpos FROM toks GROUP BY term, doc_id
),
posting AS (
    SELECT term,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') || ':'
               || lpad(CAST(fpos AS VARCHAR), 5, '0') AS p
    FROM first_pos
)
SELECT term, COUNT(*) AS df,
       array_to_string((list_sort(list(p)))[1:{_POSTINGS_CAP}], ',') AS postings
FROM posting
GROUP BY term
ORDER BY term
"""


QUERIES = {
    "bm25_search": bm25_search,
    "inverted_index_postings": inverted_index_postings,
}

ORACLES = {
    "bm25_search": BM25_SEARCH_SQL,
    "inverted_index_postings": INVERTED_INDEX_SQL,
}
