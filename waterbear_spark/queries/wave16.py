"""Round-4 wave-16 operators: t-closeness (completing the anonymity
triad) and stratified k-fold assignment (completing the split family).

* ``tcloseness_release`` — the third anonymity gate after
  [[kanon_suppressed_cube]] (group size) and [[ldiversity_release]]
  (sensitive-value variety): a QI group passes only when its sensitive
  distribution is CLOSE to the global one — Earth Mover's Distance for
  ordered categories, EMD = Σ|cum_p − cum_q| / (m−1) — catching groups
  that are size-safe and diverse but still skewed enough to leak
  ("every customer in this stratum is rich").
* ``stratified_kfold_census`` — deterministic stratified k-fold: docs
  rank by md5 within their language and take fold = rank mod k, so
  fold sizes within every stratum differ by at most one — the
  guarantee the hash-bucket [[deterministic_split]] deliberately
  trades away for stateless assignment.

Float determinism follows the house rules in ``tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table

# ---------------------------------------------------------------------------
# t-closeness release gate
# ---------------------------------------------------------------------------

_TC_BAND = 2000.0  # sensitive attribute: account-balance band width
_TC_T = 0.2  # release threshold on EMD


def tcloseness_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (nation, segment) quasi-identifier
    with the account-balance band as the ORDERED sensitive attribute:
    per group, the Earth Mover's Distance between the group's band
    distribution and the global one, EMD = Σ|cum_p − cum_q| / (m−1)
    (the t-closeness paper's formulation for ordered domains), and the
    release flag EMD <= t. Groups are completed against the GLOBAL band
    spine (a band missing from a group still accumulates |cum| mass —
    skipping it would understate the distance).

    Determinism: cumulative counts are integers from windows over the
    bounded band domain; the per-group |diff| terms fold in band order.

    Scale: one (QI, band) census, a |groups| × |bands| grid (both
    domain-bounded, broadcast spine), windows partitioned by group over
    <= |bands| rows.
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / _TC_BAND).cast("int").alias("band"),
    )
    cells = rows.groupBy("nation", "segment", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = cells.groupBy("nation", "segment").agg(F.sum("c").alias("n"))
    gband = cells.groupBy("band").agg(F.sum("c").alias("g"))
    wg = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    spine = gband.select(
        "band",
        F.sum("g").over(wg).alias("cum_g"),
    )
    total = rows.count()
    m = spine.count()
    grid = (
        groups.crossJoin(F.broadcast(spine))
        .join(cells, ["nation", "segment", "band"], "left")
        .select(
            "nation",
            "segment",
            "band",
            "n",
            "cum_g",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wq = (
        Window.partitionBy("nation", "segment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = grid.select(
        "nation",
        "segment",
        "n",
        "band",
        F.abs(
            F.sum("c").over(wq) / F.col("n") - F.col("cum_g") / F.lit(total)
        ).alias("term"),
    )
    emd = (
        terms.groupBy("nation", "segment", "n")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("band", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                )
                # max(m-1, 1): with a single global band every term is
                # already 0 and EMD is 0 by definition — the guard only
                # keeps ANSI mode from raising on the degenerate /0
                / F.lit(max(m - 1, 1)),
                6,
            ).alias("emd")
        )
    )
    return emd.select(
        "nation",
        "segment",
        F.col("n").alias("n_custs"),
        "emd",
        (F.col("emd") <= _TC_T).alias("released"),
    ).orderBy("nation", "segment")


_TCLOSE_SQL = f"""
WITH rows_ AS MATERIALIZED (
    SELECT n_name AS nation, c_mktsegment AS segment,
           CAST(FLOOR(c_acctbal / {_TC_BAND}) AS INTEGER) AS band
    FROM customer JOIN nation ON c_nationkey = n_nationkey
),
cells AS MATERIALIZED (
    SELECT nation, segment, band, COUNT(*) AS c
    FROM rows_ GROUP BY 1, 2, 3
),
groups AS MATERIALIZED (
    SELECT nation, segment, SUM(c) AS n FROM cells GROUP BY 1, 2
),
spine AS MATERIALIZED (
    SELECT band, SUM(g) OVER (ORDER BY band
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
    FROM (SELECT band, SUM(c) AS g FROM cells GROUP BY band)
),
consts AS (SELECT COUNT(*) AS total FROM rows_),
mval AS (SELECT COUNT(*) AS m FROM spine),
grid AS MATERIALIZED (
    SELECT g.nation, g.segment, s.band, g.n, s.cum_g,
           COALESCE(c.c, 0) AS c
    FROM groups g CROSS JOIN spine s
    LEFT JOIN cells c
      ON c.nation = g.nation AND c.segment = g.segment AND c.band = s.band
),
terms AS (
    SELECT nation, segment, n, band,
           ABS(SUM(c) OVER (PARTITION BY nation, segment ORDER BY band
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(n AS DOUBLE)
               - cum_g / CAST((SELECT total FROM consts) AS DOUBLE)) AS term
    FROM grid
),
emd AS (
    SELECT nation, segment, n,
           ROUND(list_aggregate(list(term ORDER BY band), 'sum')
                 / GREATEST((SELECT m FROM mval) - 1, 1), 6) AS emd
    FROM terms GROUP BY nation, segment, n
)
SELECT nation, segment, CAST(n AS BIGINT) AS n_custs, emd,
       emd <= {_TC_T} AS released
FROM emd
ORDER BY nation, segment
"""


# ---------------------------------------------------------------------------
# Stratified k-fold assignment
# ---------------------------------------------------------------------------

_KF_K = 5


def stratified_kfold_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment: within each language
    stratum, documents rank by md5('kf|' || doc_id) and take
    fold = (rank − 1) mod k — every stratum's folds differ in size by
    at most one (the guarantee [[deterministic_split]]'s stateless
    hash-bucketing trades away), while assignment stays reproducible
    under re-runs and repartitioning. Output: the (lang, fold) census.

    Scale: the rank window partitions by stratum; at 100 TB a single
    giant stratum would use the two-level bucket scaffold
    ([[lorenz_curve_deciles]]'s) instead of one partition — the census
    output and mod-k algebra are unchanged.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    key = F.md5(F.concat(F.lit("kf|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    folded = docs.select(
        "lang",
        ((F.row_number().over(w) - 1) % _KF_K).alias("fold"),
    )
    return (
        folded.groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "fold")
    )


_KFOLD_SQL = f"""
SELECT lang, fold, COUNT(*) AS n_docs
FROM (
    SELECT lang,
           (ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY md5('kf|' || CAST(doc_id AS VARCHAR)), doc_id
            ) - 1) % {_KF_K} AS fold
    FROM documents
)
GROUP BY lang, fold
ORDER BY lang, fold
"""


QUERIES = {
    "tcloseness_release": tcloseness_release,
    "stratified_kfold_census": stratified_kfold_census,
}
ORACLES = {
    "tcloseness_release": _TCLOSE_SQL,
    "stratified_kfold_census": _KFOLD_SQL,
}
