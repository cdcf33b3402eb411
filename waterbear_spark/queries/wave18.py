"""Round-5 wave-18 operators: the curation-funnel trio.

* ``quality_gate_funnel`` — per-gate attrition census for a C4/FineWeb
  -style heuristic filter chain over ``documents``: length floor, mean
  word length band, stopword-ratio floor, top-token repetition cap,
  language whitelist — applied IN ORDER, reporting ``n_in / n_fail /
  n_out`` per gate. The per-gate attrition view (not just the final
  keep rate) is what a curation team actually tunes; complements the
  per-doc scores in [[doc_quality]] / [[lm_quality_score]] and the
  pipeline gate in ``pipeline.training_corpus``. Every ratio gate is
  evaluated by integer cross-multiplication (``20*stop >= cnt`` instead
  of ``stop/cnt >= 0.05``), so the whole funnel is exact integer
  arithmetic — no float thresholds to drift between engines.
* ``epoch_allocation`` — data-constrained mixture allocation (the
  "repeat scarce high-quality sources, cap epochs" step of budgeted
  pretraining, cf. Muennighoff et al. 2023, arXiv:2305.16264): targets
  ∝ sqrt(available tokens) (the same temperature family as
  [[temperature_mix_weights]]), a hard per-source epoch cap, and ONE
  proportional redistribution of the leftover among uncapped sources —
  closed-form and deterministic, vs the iterative waterfall in
  [[mixing_water_fill]]. All token quantities stay integers; the only
  floats are per-source weights (identical IEEE ops on identical
  integer inputs), and every sum that crosses sources is an integer or
  128-bit-decimal sum, never an order-sensitive double sum.
* ``embedding_quantization_audit`` — symmetric per-dimension int8
  quantization audit: global per-dim max-abs scale, quantize/clamp/
  reconstruct row-locally, report per-label mean/max reconstruction
  error — the "is int8 safe for this corpus" gate before shipping a
  quantized ANN index ([[ann_ivf_kmeans]] cells store int8 in
  production). Rounding uses ``floor(x + 0.5)`` (exact in both
  engines) and error sums ride fixed-point BIGINTs.

Scale notes: the funnel is one scan plus one (doc_id)-keyed explode
aggregate for the repetition gate; epoch allocation reduces to one
|sources|-row relation; the quantization audit shuffles (dim) once for
scales — 64 rows — and (label) once for the report. Nothing touches a
pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table

# ---------------------------------------------------------------------------
# quality gate funnel
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")
_LANG_OK = ("en", "de", "fr", "es")
_MIN_CHARS = 200
# gate-band multipliers, shared with the streaming twin
# (streaming/funnel.py) so the Kappa contract can't drift silently
_WLEN_LO = 3   # mean token length floor  (LO * cnt <= sumlen)
_WLEN_HI = 12  # mean token length ceiling (sumlen <= HI * cnt)
_STOP_X = 20   # stopword floor: STOP_X * stop >= cnt  (share >= 5%)
_REP_X = 5     # repetition cap: REP_X * topcnt <= cnt (share <= 20%)


def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential heuristic-gate attrition census — see module docstring.

    Gates (in order):
      1. len_floor        n_chars >= 200
      2. word_len_band    3 <= mean token length <= 12  (3*cnt <= sumlen <= 12*cnt)
      3. stopword_floor   stopword share >= 5%          (20*stop >= cnt)
      4. repetition_cap   top token share <= 20%        (5*topcnt <= cnt)
      5. lang_whitelist   lang in (en, de, fr, es)
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    docs = docs.withColumn("toks", toks).withColumn("cnt", F.size("toks"))
    docs = docs.withColumn(
        "sumlen",
        F.aggregate("toks", F.lit(0), lambda acc, t: acc + F.length(t)),
    ).withColumn(
        "stop",
        F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS))),
    )
    # top-token count needs a per-doc mode: explode once, shuffle on doc_id
    top = (
        docs.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topcnt"))
    )
    # left join + coalesce: a token-less doc (empty/whitespace-only text)
    # has no explode rows, so an inner join would silently drop it from
    # the funnel and undercount gate-1 n_in (advice r5)
    flags = docs.join(top, "doc_id", "left").withColumn(
        "topcnt", F.coalesce("topcnt", F.lit(0))
    ).select(
        (F.col("n_chars") >= _MIN_CHARS).alias("g1"),
        (
            (_WLEN_LO * F.col("cnt") <= F.col("sumlen"))
            & (F.col("sumlen") <= _WLEN_HI * F.col("cnt"))
        ).alias("g2"),
        (_STOP_X * F.col("stop") >= F.col("cnt")).alias("g3"),
        (_REP_X * F.col("topcnt") <= F.col("cnt")).alias("g4"),
        F.col("lang").isin(*_LANG_OK).alias("g5"),
    )
    names = ["len_floor", "word_len_band", "stopword_floor",
             "repetition_cap", "lang_whitelist"]
    # cumulative pass-through: survivors of gates 1..k
    cum = [F.lit(True)]
    for i in range(5):
        cum.append(cum[-1] & F.col(f"g{i + 1}"))
    agg = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        *[
            F.sum(cum[i + 1].cast("long")).alias(f"s{i + 1}")
            for i in range(5)
        ],
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("gate_idx"),
                F.lit(names[i]).alias("gate"),
                F.col(f"s{i}").alias("n_in"),
                (F.col(f"s{i}") - F.col(f"s{i + 1}")).alias("n_fail"),
                F.col(f"s{i + 1}").alias("n_out"),
            )
            for i in range(5)
        ]
    )
    return (
        agg.select(F.explode(stages).alias("st"))
        .select("st.gate_idx", "st.gate", "st.n_in", "st.n_fail", "st.n_out")
        .orderBy("gate_idx")
    )


_FUNNEL_SQL = f"""
WITH d AS (
    SELECT doc_id, lang, n_chars,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
),
base AS (
    SELECT doc_id, lang, n_chars, len(toks) AS cnt,
           list_sum(list_transform(toks, t -> length(t))) AS sumlen,
           len(list_filter(toks,
               t -> t IN {str(tuple(_STOPWORDS))})) AS stop
    FROM d
),
top AS (
    SELECT doc_id, MAX(c) AS topcnt FROM (
        SELECT doc_id, t, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS t FROM d)
        GROUP BY doc_id, t
    ) GROUP BY doc_id
),
flags AS (
    SELECT (n_chars >= {_MIN_CHARS}) AS g1,
           ({_WLEN_LO} * cnt <= sumlen AND sumlen <= {_WLEN_HI} * cnt) AS g2,
           ({_STOP_X} * stop >= cnt) AS g3,
           ({_REP_X} * COALESCE(topcnt, 0) <= cnt) AS g4,
           (lang IN {str(tuple(_LANG_OK))}) AS g5
    FROM base LEFT JOIN top USING (doc_id)
),
agg AS (
    SELECT COUNT(*) AS s0,
           SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS s1,
           SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS s2,
           SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS s3,
           SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS s4,
           SUM(CASE WHEN g1 AND g2 AND g3 AND g4 AND g5 THEN 1 ELSE 0 END) AS s5
    FROM flags
),
stages(gate_idx, gate, lo, hi) AS (
    VALUES (1, 'len_floor', 0, 1), (2, 'word_len_band', 1, 2),
           (3, 'stopword_floor', 2, 3), (4, 'repetition_cap', 3, 4),
           (5, 'lang_whitelist', 4, 5)
)
SELECT gate_idx, gate,
       CAST(CASE lo WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
                    WHEN 3 THEN s3 ELSE s4 END AS BIGINT) AS n_in,
       CAST(CASE lo WHEN 0 THEN s0 - s1 WHEN 1 THEN s1 - s2
                    WHEN 2 THEN s2 - s3 WHEN 3 THEN s3 - s4
                    ELSE s4 - s5 END AS BIGINT) AS n_fail,
       CAST(CASE hi WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
                    WHEN 4 THEN s4 ELSE s5 END AS BIGINT) AS n_out
FROM agg CROSS JOIN stages
ORDER BY gate_idx
"""


# ---------------------------------------------------------------------------
# data-constrained epoch allocation
# ---------------------------------------------------------------------------

_EA_BUDGET_NUM, _EA_BUDGET_DEN = 1, 2  # budget = 1/2 of total tokens
_EA_MAX_EPOCHS = 4
_EA_WSCALE = 1_000_000  # sqrt weights held as round(sqrt(avail)*1e6) ints


def epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted per-source token allocation with an epoch cap — see
    module docstring. One |sources|-row relation end to end."""
    docs = table(spark, sf_dir, "documents").select("source", "text")
    avail = docs.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""))
        ).alias("avail")
    )
    # integer sqrt weight: floor(x + 0.5) is the cross-engine half-up
    # (Spark Round / DuckDB ROUND disagree near .5 boundaries — advice r5)
    avail = avail.withColumn(
        "w_fp",
        F.floor(F.sqrt(F.col("avail").cast("double")) * _EA_WSCALE + 0.5)
        .cast("bigint"),
    )
    tot = avail.agg(
        F.sum("avail").alias("tot_avail"), F.sum("w_fp").alias("tot_w")
    )
    j = avail.crossJoin(F.broadcast(tot))
    budget = (
        F.col("tot_avail") * _EA_BUDGET_NUM / F.lit(_EA_BUDGET_DEN)
    )  # integer-valued double (den=2)
    # desired_i = floor(budget * w_i / W) in exact 128-bit arithmetic:
    # budget*w_fp can pass 2^53, so ride decimal with the remainder trick
    num = (
        (F.col("tot_avail").cast("decimal(38,0)") * _EA_BUDGET_NUM)
        * F.col("w_fp").cast("decimal(38,0)")
    )
    den = F.col("tot_w").cast("decimal(38,0)") * _EA_BUDGET_DEN
    desired = ((num - num % den) / den).cast("decimal(38,0)").cast("bigint")
    j = j.withColumn("desired", desired).withColumn(
        "cap", F.col("avail") * _EA_MAX_EPOCHS
    )
    j = j.withColumn("alloc1", F.least("desired", "cap")).withColumn(
        "capped", F.col("desired") > F.col("cap")
    )
    # one proportional redistribution of the integer leftover among the
    # uncapped sources (exact floor division again)
    redo = j.agg(
        (F.sum("desired") - F.sum("alloc1")).alias("leftover"),
        F.sum(F.when(~F.col("capped"), F.col("w_fp")).otherwise(0)).alias(
            "w_free"
        ),
    )
    j = j.crossJoin(F.broadcast(redo))
    num2 = F.col("leftover").cast("decimal(38,0)") * F.col("w_fp").cast(
        "decimal(38,0)"
    )
    den2 = F.col("w_free").cast("decimal(38,0)")
    extra = F.when(
        (~F.col("capped")) & (F.col("w_free") > 0),
        ((num2 - num2 % den2) / den2).cast("decimal(38,0)").cast("bigint"),
    ).otherwise(F.lit(0))
    return (
        j.withColumn("allocated", F.col("alloc1") + extra)
        .select(
            "source",
            "avail",
            F.round(
                F.col("w_fp").cast("double") / F.col("tot_w").cast("double"), 6
            ).alias("weight"),
            "allocated",
            F.round(
                F.col("allocated").cast("double") / F.col("avail").cast("double"),
                4,
            ).alias("epochs"),
            "capped",
        )
        .orderBy("source")
    )


_EPOCH_SQL = f"""
WITH avail AS (
    SELECT source,
           SUM(len(list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> ''))) AS avail
    FROM documents GROUP BY source
),
w AS (
    SELECT source, avail,
           CAST(FLOOR(SQRT(CAST(avail AS DOUBLE)) * {_EA_WSCALE} + 0.5)
                AS BIGINT) AS w_fp
    FROM avail
),
tot AS (SELECT SUM(avail) AS tot_avail, SUM(w_fp) AS tot_w FROM w),
j AS (
    SELECT w.*, tot.tot_avail, tot.tot_w,
           (CAST(tot_avail AS HUGEINT) * {_EA_BUDGET_NUM}
            * CAST(w_fp AS HUGEINT))
           // (CAST(tot_w AS HUGEINT) * {_EA_BUDGET_DEN}) AS desired,
           avail * {_EA_MAX_EPOCHS} AS cap
    FROM w CROSS JOIN tot
),
j2 AS (
    SELECT *, LEAST(desired, CAST(cap AS HUGEINT)) AS alloc1,
           desired > CAST(cap AS HUGEINT) AS capped
    FROM j
),
redo AS (
    SELECT SUM(desired) - SUM(alloc1) AS leftover,
           SUM(CASE WHEN NOT capped THEN w_fp ELSE 0 END) AS w_free
    FROM j2
)
SELECT source, CAST(avail AS BIGINT) AS avail,
       ROUND(CAST(w_fp AS DOUBLE) / CAST(tot_w AS DOUBLE), 6) AS weight,
       CAST(alloc1 + CASE WHEN NOT capped AND w_free > 0 THEN
               (CAST(leftover AS HUGEINT) * CAST(w_fp AS HUGEINT))
               // CAST(w_free AS HUGEINT)
            ELSE 0 END AS BIGINT) AS allocated,
       ROUND(CAST(alloc1 + CASE WHEN NOT capped AND w_free > 0 THEN
               (CAST(leftover AS HUGEINT) * CAST(w_fp AS HUGEINT))
               // CAST(w_free AS HUGEINT)
            ELSE 0 END AS DOUBLE) / CAST(avail AS DOUBLE), 4) AS epochs,
       capped
FROM j2 CROSS JOIN redo
ORDER BY source
"""


# ---------------------------------------------------------------------------
# embedding int8 quantization audit
# ---------------------------------------------------------------------------

_Q_ERRSCALE = 1_000_000_000  # abs-error fixed point (1e-9 resolution)


def embedding_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dim int8 quantization audit — see module docstring."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    comp = emb.select(
        "label", F.posexplode("v").alias("dim", "x")
    )
    scales = comp.groupBy("dim").agg(F.max(F.abs("x")).alias("mx"))
    # quantize: q = clamp(floor(x*127/mx + 0.5), -127, 127); floor(x+0.5)
    # is the cross-engine half-up (DuckDB ROUND on doubles is not)
    q = F.greatest(
        F.lit(-127),
        F.least(F.lit(127), F.floor(F.col("x") * 127.0 / F.col("mx") + 0.5)),
    )
    err = F.abs(F.col("x") - q * F.col("mx") / 127.0)
    per = (
        comp.join(F.broadcast(scales), "dim")
        .filter(F.col("mx") > 0)  # a dead dim quantizes losslessly to 0
        .select(
            "label",
            # floor(x + 0.5), same half-up as the quantizer itself (err
            # is nonnegative); F.round vs DuckDB ROUND can hash-diverge
            # within half an ulp of a .5 boundary (advice r5)
            F.floor(err * _Q_ERRSCALE + 0.5).cast("bigint").alias("err_fp"),
        )
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.round(
                F.sum("err_fp").cast("double")
                / F.count(F.lit(1)).cast("double")
                / _Q_ERRSCALE,
                9,
            ).alias("mean_abs_err"),
            F.round(F.max("err_fp").cast("double") / _Q_ERRSCALE, 9).alias(
                "max_abs_err"
            ),
        )
        .orderBy("label")
    )


_QUANT_SQL = f"""
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comp AS (
    SELECT label, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM e
),
scales AS (SELECT dim, MAX(ABS(x)) AS mx FROM comp GROUP BY dim),
per AS (
    SELECT label,
           CAST(FLOOR(ABS(x - GREATEST(-127, LEAST(127,
                    FLOOR(x * 127.0 / mx + 0.5))) * mx / 127.0)
                * {_Q_ERRSCALE} + 0.5) AS BIGINT) AS err_fp
    FROM comp JOIN scales USING (dim)
    WHERE mx > 0
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_components,
       ROUND(CAST(SUM(err_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / {_Q_ERRSCALE}, 9) AS mean_abs_err,
       ROUND(CAST(MAX(err_fp) AS DOUBLE) / {_Q_ERRSCALE}, 9) AS max_abs_err
FROM per
GROUP BY label
ORDER BY label
"""


QUERIES = {
    "quality_gate_funnel": quality_gate_funnel,
    "epoch_allocation": epoch_allocation,
    "embedding_quantization_audit": embedding_quantization_audit,
}

ORACLES = {
    "quality_gate_funnel": _FUNNEL_SQL,
    "epoch_allocation": _EPOCH_SQL,
    "embedding_quantization_audit": _QUANT_SQL,
}
