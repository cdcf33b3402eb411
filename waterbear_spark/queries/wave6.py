"""Round-3 wave-6 operators: Poisson-bootstrap confidence intervals,
two-proportion A/B testing, harmonic centrality, shingle containment
join, and the decile lift/gains table.

Operator families the catalog didn't cover yet:

* ``bootstrap_ci_mean`` — the Poisson bootstrap (Chamandy et al.,
  Google 2012): per-row Poisson(1) multiplicities from a deterministic
  hash replace the classical resample, so every replicate is one
  map-side-combinable aggregate — THE way to bootstrap on a cluster,
  where "draw n rows with replacement" is impossible without knowing n.
* ``ab_test_proportions`` — the two-proportion pooled z-test with Wald
  confidence interval, the experimentation-platform primitive.
* ``harmonic_centrality`` — all-pairs-BFS harmonic centrality
  (Boldi-Vigna's preferred closeness variant: sums 1/d, handles
  disconnection for free) by min-plus iteration.
* ``containment_join`` — asymmetric shingle containment |A∩B| / |A|
  (clone/quote detection: Jaccard misses a small doc swallowed by a
  big one; containment is the direction MinHash can't estimate).
* ``decile_lift_table`` — the model-evaluation lift/gains table over
  score deciles, computed with the distributed exact NTILE
  (operators/ntile.py), positives = fully-shipped orders.

Float determinism follows the house rules in ``tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import DEC, table

# ---------------------------------------------------------------------------
# Poisson bootstrap CI for the mean
# ---------------------------------------------------------------------------

_BOOT_R = 32
_BOOT_PAIRS = _BOOT_R // 2  # one md5 digest feeds TWO replicates (below)
_HASH_SPACE = 281474976710656.0  # 2^48, exact double
# cumulative Poisson(1) CDF thresholds; identical literals in both
# engines, so the inverse-CDF draw is bit-deterministic
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _u48(hex12):
    """Uniform in [0,1) from 12 md5 hex chars — the parsed integer is
    exact and 2^48 a power of two, so the division is exact."""
    return F.conv(hex12, 16, 10).cast("bigint") / _HASH_SPACE


def _pois_w(u):
    w = F.lit(6)
    for i, t in reversed(list(enumerate(_POIS_CDF))):
        w = F.when(u < t, i).otherwise(w)
    return w


def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the mean order price: {r} replicates,
    each row's multiplicity in replicate b drawn Poisson(1) from
    md5(b|key) by inverse CDF. Replicate means are exact decimal sums
    with one closing division; the CI takes the 2nd/31st order
    statistics of the 32 means (2.5%/97.5% with r={r}).

    Scale: the fan-out is a row-local explode of a 32-element literal
    range — each (replicate, partial-sum) combines map-side, so the
    shuffle carries r x #partitions tiny rows no matter the fact count.
    The replicate relation (32 rows) is then folded driver-free into
    one report row. r is the knob: wider CIs need r~200, still flat.

    The md5 draw is the cross-engine-deterministic choice for the
    oracle harness; a production build swaps in ``F.xxhash64(key, b)``
    for the same inverse-CDF draw at a fraction of the hash cost (the
    hashing IS this operator's whole budget — STRATEGY_BENCH's
    ``bootstrap_hash_draw`` row measures the gap). Round 10 halves the
    md5 budget INSIDE the oracle-deterministic design: each 128-bit
    digest yields two independent 48-bit uniforms (hex chars 1-12 and
    13-24), so replicate pair (2p, 2p+1) shares one ``md5(p|key)`` —
    {r} replicates cost {p} hashes per row, not {r}. Both substrings
    sit in ONE projection so codegen's subexpression elimination
    evaluates the md5 once.
    """
    from waterbear_spark.queries.llm import _fan_out

    o = table(spark, sf_dir, "orders")
    # the hash draw is the budget and it runs in the SCAN stage — widen
    # a narrow scan (one file at small sf) across cores before the
    # explode; no-op when the table already has >= cores splits
    rep = _fan_out(spark, o.select("o_orderkey", "o_totalprice")).select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_PAIRS - 1))).alias("p"),
    )
    h = F.md5(
        F.concat(
            F.col("p").cast("string"), F.lit("|"), F.col("o_orderkey").cast("string")
        )
    )
    hashed = rep.select(
        "o_totalprice",
        "p",
        _u48(F.substring(h, 1, 12)).alias("u0"),
        _u48(F.substring(h, 13, 12)).alias("u1"),
    )
    pairs = hashed.select(
        "o_totalprice",
        F.explode(
            F.array(
                F.struct((F.col("p") * 2).alias("b"), F.col("u0").alias("u")),
                F.struct((F.col("p") * 2 + 1).alias("b"), F.col("u1").alias("u")),
            )
        ).alias("e"),
    )
    weighted = pairs.select(
        F.col("e.b").alias("b"),
        "o_totalprice",
        _pois_w(F.col("e.u")).alias("w"),
    )
    means = (
        weighted.groupBy("b")
        .agg(
            (
                F.sum((F.col("o_totalprice") * F.col("w")).cast(DEC)).cast("double")
                / F.sum("w")
            ).alias("m")
        )
        .select(F.round("m", 6).cast(DEC).alias("m"))
    )
    full = o.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "mean_full"
        )
    )
    report = means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        # try_element_at: an empty input yields zero replicates, and the
        # report degrades to NULL bounds instead of erroring under ANSI
        F.round(F.try_element_at(F.array_sort(F.collect_list("m")), F.lit(2)), 4)
        .cast("double")
        .alias("ci_lo"),
        F.round(
            F.try_element_at(
                F.array_sort(F.collect_list("m")), F.lit(_BOOT_R - 1)
            ),
            4,
        )
        .cast("double")
        .alias("ci_hi"),
        F.round(F.avg("m"), 4).cast("double").alias("boot_mean"),
    )
    return report.crossJoin(F.broadcast(full)).select(
        "n_replicates",
        F.round("mean_full", 4).alias("mean_full"),
        "boot_mean",
        "ci_lo",
        "ci_hi",
    )

bootstrap_ci_mean.__doc__ = bootstrap_ci_mean.__doc__.format(r=_BOOT_R, p=_BOOT_PAIRS)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {i}" for i, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


def _u48_sql(start: int) -> str:
    return (
        f"CAST(('0x' || SUBSTR(h, {start}, 12)) AS UBIGINT)::BIGINT"
        f" / {_HASH_SPACE}"
    )


BOOTSTRAP_CI_MEAN_SQL = f"""
WITH rep AS (
    SELECT o_orderkey, o_totalprice, UNNEST(generate_series(0, {_BOOT_PAIRS - 1})) AS p
    FROM orders
),
hashed AS MATERIALIZED (
    SELECT o_totalprice, p,
           MD5(CAST(p AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)) AS h
    FROM rep
),
weighted AS (
    SELECT 2 * p AS b, o_totalprice, {_pois_case_sql(_u48_sql(1))} AS w
    FROM hashed
    UNION ALL
    SELECT 2 * p + 1 AS b, o_totalprice, {_pois_case_sql(_u48_sql(13))} AS w
    FROM hashed
),
means AS (
    SELECT CAST(ROUND(CAST(SUM(CAST(o_totalprice * w AS DECIMAL(20,6))) AS DOUBLE)
                / SUM(w), 6) AS DECIMAL(20,6)) AS m
    FROM weighted GROUP BY b
),
fullm AS (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
           AS mean_full
    FROM orders
),
report AS (
    SELECT COUNT(*) AS n_replicates,
           CAST(ROUND((ARRAY_AGG(m ORDER BY m))[2], 4) AS DOUBLE) AS ci_lo,
           CAST(ROUND((ARRAY_AGG(m ORDER BY m))[{_BOOT_R - 1}], 4) AS DOUBLE) AS ci_hi,
           CAST(ROUND(AVG(m), 4) AS DOUBLE) AS boot_mean
    FROM means
)
SELECT n_replicates, ROUND(mean_full, 4) AS mean_full, boot_mean, ci_lo, ci_hi
FROM report CROSS JOIN fullm
"""


# ---------------------------------------------------------------------------
# Two-proportion A/B z-test
# ---------------------------------------------------------------------------

_AB_A = "1-URGENT"
_AB_B = "5-LOW"
_Z95 = 1.959963984540054


def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test between order priorities '{a}' and
    '{b}' on the fully-shipped rate, with the Wald 95% CI of the
    difference — the experiment readout: one combinable aggregate over
    each arm, then closed-form IEEE arithmetic on four integers (sqrt
    is correctly-rounded per IEEE 754, so both engines agree exactly).
    """
    o = table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    arms = (
        o.filter(F.col("o_orderpriority").isin(_AB_A, _AB_B))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("x"))
    )
    a = arms.filter(F.col("o_orderpriority") == _AB_A).select(
        F.col("n").alias("n1"), F.col("x").alias("x1")
    )
    b = arms.filter(F.col("o_orderpriority") == _AB_B).select(
        F.col("n").alias("n2"), F.col("x").alias("x2")
    )
    j = a.crossJoin(F.broadcast(b))
    p1 = F.col("x1") / F.col("n1")
    p2 = F.col("x2") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")) / (F.col("n1") + F.col("n2"))
    se_pooled = F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    se_wald = F.sqrt(p1 * (1 - p1) / F.col("n1") + p2 * (1 - p2) / F.col("n2"))
    return j.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.round(p1 - p2, 6).alias("diff"),
        F.round((p1 - p2) / se_pooled, 4).alias("z"),
        F.round(p1 - p2 - _Z95 * se_wald, 6).alias("ci_lo"),
        F.round(p1 - p2 + _Z95 * se_wald, 6).alias("ci_hi"),
    )

ab_test_proportions.__doc__ = ab_test_proportions.__doc__.format(a=_AB_A, b=_AB_B)


AB_TEST_SQL = f"""
WITH arms AS (
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x
    FROM orders
    WHERE o_orderpriority IN ('{_AB_A}', '{_AB_B}')
    GROUP BY o_orderpriority
),
j AS (
    SELECT a.n AS n1, a.x AS x1, b.n AS n2, b.x AS x2
    FROM (SELECT n, x FROM arms WHERE o_orderpriority = '{_AB_A}') a
    CROSS JOIN (SELECT n, x FROM arms WHERE o_orderpriority = '{_AB_B}') b
)
SELECT n1, x1, n2, x2,
       ROUND(CAST(x1 AS DOUBLE) / n1, 6) AS rate_a,
       ROUND(CAST(x2 AS DOUBLE) / n2, 6) AS rate_b,
       ROUND(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2, 6) AS diff,
       ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / SQRT((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 4) AS z,
       ROUND(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2
             - {_Z95} * SQRT((CAST(x1 AS DOUBLE) / n1) * (1 - CAST(x1 AS DOUBLE) / n1) / n1
                             + (CAST(x2 AS DOUBLE) / n2) * (1 - CAST(x2 AS DOUBLE) / n2) / n2), 6)
           AS ci_lo,
       ROUND(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2
             + {_Z95} * SQRT((CAST(x1 AS DOUBLE) / n1) * (1 - CAST(x1 AS DOUBLE) / n1) / n1
                             + (CAST(x2 AS DOUBLE) / n2) * (1 - CAST(x2 AS DOUBLE) / n2) / n2), 6)
           AS ci_hi
FROM j
"""


# ---------------------------------------------------------------------------
# Harmonic centrality (all-pairs BFS by min-plus iteration)
# ---------------------------------------------------------------------------

_HC_ROUNDS = 4


def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality sum(1/d(v,u)) over the nation trade graph by
    {r} rounds of min-plus frontier expansion from EVERY node at once
    (the all-pairs generalization of [[bfs_shortest_paths]]).
    Boldi-Vigna's variant: unreachable pairs contribute 0, no
    disconnection special-case. Each 1/d is rounded into exact decimal,
    so the centrality sum is order-free.

    Scale: state is the reachable pair set — on small-diameter graphs
    the product space, so this exact form is for dimension-sized
    graphs (the bounded edge array rides along each exploded source row
    and every per-source BFS is row-local). Web-scale graphs swap in
    HyperBall (HLL neighborhood sketches), trading exactness for |V|
    state.
    """
    from waterbear_spark.operators import microg
    from waterbear_spark.queries.graph import _und_edges

    # bounded graph (2 x top-100 edges by construction): explode one row
    # per source node, then run that source's BFS row-locally over the
    # packed edge array — |nodes| parallel row-local BFS computations
    # instead of _HC_ROUNDS serialized checkpoint+shuffle rounds over
    # the pair space (operators/microg.py)
    packed = microg.pack_edges(_und_edges(spark, sf_dir))
    nodes = F.array_sort(
        F.array_distinct(F.transform(F.col("edges"), lambda e: e["src"]))
    )
    per_src = packed.select(
        F.col("edges"), F.explode(nodes).alias("s")
    ).repartition(F.col("s"))  # one-task explode -> spread the |nodes|
    # row-local BFS computations across the cluster
    # explode-of-one-element barrier: the per-source BFS is evaluated
    # exactly ONCE per row and materialized as a generator output column
    # (plain column references would inline — and re-run — the whole
    # BFS once per referencing expression)
    bfs = microg.bfs_distances(F.col("edges"), _HC_ROUNDS, F.col("s"))
    dists = per_src.select(
        F.col("s"), F.explode(F.array(bfs)).alias("dist")
    )
    reached = F.filter(F.col("dist"), lambda x: x["node"] != F.col("s"))
    # exact decimal fold, order-free — same arithmetic as the previous
    # SUM(round(1/d, 6) :: DECIMAL) aggregate
    harm = F.round(
        F.aggregate(
            reached,
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: (
                acc + F.round(F.lit(1.0) / x["d"], 6).cast(DEC)
            ).cast("decimal(38,6)"),
        ),
        6,
    ).cast("double")
    return (
        dists.select(
            F.col("s").alias("node"),
            F.size(reached).cast("bigint").alias("n_reached"),
            harm.alias("harmonic"),
        )
        .orderBy(F.col("harmonic").desc(), "node")
    )

harmonic_centrality.__doc__ = harmonic_centrality.__doc__.format(r=_HC_ROUNDS)


def _harmonic_sql() -> str:
    from waterbear_spark.queries.graph import _EDGES_CTE

    ctes = []
    prev = "d0"
    for i in range(1, _HC_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS (
    SELECT s, t, MIN(d) AS d FROM (
        SELECT s, t, d FROM {prev}
        UNION ALL
        SELECT p.s, e.dst AS t, p.d + 1 AS d
        FROM {prev} p JOIN und e ON p.t = e.src
    ) GROUP BY s, t
)"""
        )
        prev = f"d{i}"
    return f"""
WITH {_EDGES_CTE},
nodes AS (SELECT DISTINCT src AS v FROM und),
d0 AS (SELECT v AS s, v AS t, 0 AS d FROM nodes),
{",".join(ctes)}
SELECT s AS node,
       COUNT(*) AS n_reached,
       CAST(ROUND(SUM(CAST(ROUND(1.0 / d, 6) AS DECIMAL(20,6))), 6) AS DOUBLE)
           AS harmonic
FROM {prev}
WHERE s <> t
GROUP BY s
ORDER BY harmonic DESC, node
"""


# ---------------------------------------------------------------------------
# Shingle containment join
# ---------------------------------------------------------------------------

_CT_DF_MAX = 20    # rare-shingle blocking: df in [2, _CT_DF_MAX]
_CT_MIN_SHARED = 3  # candidates must share >= this many rare shingles
_CT_MIN = 0.5      # report containment >= 50%
_CT_TOPK = 20


def containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment join: |shingles(A) ∩ shingles(B)| /
    |shingles(A)| over 3-word shingle sets — the clone/quote-detection
    direction that Jaccard (and MinHash) cannot see when a small doc is
    swallowed by a much larger one.

    Candidate generation blocks on RARE shingles (document frequency in
    [2, {m}]) and keeps only pairs sharing >= {k} of them — measured at
    sf0.1: >=1 shared admits 2.24M pairs, >=3 admits 20k, a 100x cut
    before the exact intersection, which is one row-local
    ``array_intersect`` of the two docs' shingle-set arrays per
    candidate — no pair ever materializes a set product, and no
    (shingle, doc) stream is ever shuffled for verification. Pairs whose overlap is all common
    shingles, or spread over < {k} rare ones, are missed by design
    (blocking recall, cf. [[dedup_recall_report]]); a true-containment
    pair at >= 50% shares half of A's shingle set, which at typical df
    skew includes many rare shingles.
    """
    from waterbear_spark.queries.llm import _fan_out, _shingles, _tokens

    # shingle hashing dominates and runs at scan width — widen first
    # (AQE_PROBE_r11 family: 1.9x at the bench scale; no-op on
    # production-width scans)
    docs = _fan_out(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", _tokens(F.col("text")).alias("toks"))
    # keep the SET form: each doc's distinct shingles stay one array row,
    # so the exact-intersection phase is a row-local array_intersect
    # instead of two corpus-sized (shingle, doc) shuffles (r11; guide
    # §2.3 "shuffle keys, not payloads", §2.4)
    docs_arr = (
        docs.filter(F.size("toks") >= 3)
        .select(
            "doc_id", F.array_distinct(_shingles(F.col("toks"))).alias("sharr")
        )
        .persist()
    )
    sh = docs_arr.select("doc_id", F.explode("sharr").alias("sh"))
    rare = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _CT_DF_MAX))
        .select("sh")
    )
    # candidate pairs without a self-join: df <= {m} bounds each rare
    # shingle's doc list, so the C(df,2) ordered pairs are enumerated
    # ROW-LOCALLY from one bounded collect (the basket pattern of
    # itemset_pair_lift) instead of shuffling rare_sh twice through an
    # equi-join. The count-then-collect split keeps the collect bounded:
    # hub shingles never reach the list aggregate.
    cand = (
        sh.join(rare, "sh")
        .groupBy("sh")
        .agg(F.collect_list("doc_id").alias("ds"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, a ->"
                    " transform(filter(ds, b -> b != a),"
                    " b -> struct(a AS da, b AS db))))"
                )
            ).alias("p")
        )
        .select("p.da", "p.db")
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("n_rare_shared"))
        .filter(F.col("n_rare_shared") >= _CT_MIN_SHARED)
        .select("da", "db")
    )
    return (
        cand.join(
            docs_arr.select(
                F.col("doc_id").alias("da"), F.col("sharr").alias("sa")
            ),
            "da",
        )
        .join(
            docs_arr.select(
                F.col("doc_id").alias("db"), F.col("sharr").alias("sb")
            ),
            "db",
        )
        .select(
            "da",
            "db",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("n_inter"),
            F.size("sa").cast("long").alias("sz_a"),
        )
        .select(
            "da",
            "db",
            "n_inter",
            "sz_a",
            F.round(F.col("n_inter").cast("double") / F.col("sz_a"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= _CT_MIN)
        .orderBy(F.col("containment").desc(), "da", "db")
        .limit(_CT_TOPK)
    )

containment_join.__doc__ = containment_join.__doc__.format(m=_CT_DF_MAX, k=_CT_MIN_SHARED)


def _containment_sql() -> str:
    from waterbear_spark.queries.llm import SHINGLES_SQL, TOKENS_SQL

    return f"""
WITH toked AS (
    SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
),
sh AS (
    SELECT doc_id, UNNEST(list_distinct({SHINGLES_SQL})) AS sh
    FROM toked
    WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (
    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
    WHERE df BETWEEN 2 AND {_CT_DF_MAX}
),
rare_sh AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r USING (sh)),
cand AS (
    SELECT a.doc_id AS da, b.doc_id AS db
    FROM rare_sh a JOIN rare_sh b USING (sh)
    WHERE a.doc_id <> b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_CT_MIN_SHARED}
),
inter AS (
    SELECT c.da, c.db, COUNT(*) AS n_inter
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.da
    JOIN sh sb ON sb.doc_id = c.db AND sb.sh = sa.sh
    GROUP BY c.da, c.db
)
SELECT i.da, i.db, i.n_inter, z.sz AS sz_a,
       ROUND(CAST(i.n_inter AS DOUBLE) / z.sz, 6) AS containment
FROM inter i JOIN sizes z ON z.doc_id = i.da
WHERE CAST(i.n_inter AS DOUBLE) / z.sz >= {_CT_MIN}
ORDER BY containment DESC, da, db
LIMIT {_CT_TOPK}
"""


# ---------------------------------------------------------------------------
# Decile lift / gains table
# ---------------------------------------------------------------------------

_LIFT_K = 10


def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation lift/gains table: orders ranked by price into
    exact deciles (distributed NTILE, [[quantile_normalize_lengths]]'s
    operator — no global sort), positives = fully-shipped; per decile
    the response rate, lift over the base rate, and cumulative gain.

    All integers until the three closing divisions; the 10-row window
    is driver-free. This is the eval loop for [[target_encoding]]-style
    scores: swap the ranking column for any model score.
    """
    from waterbear_spark.operators.ntile import bucketed_ntile

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    tiled = bucketed_ntile(
        o, "o_totalprice", "o_orderkey", _LIFT_K, out_col="decile", width=1024.0
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per.select(
        "decile",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("rate"),
        F.round(
            (F.col("pos").cast("double") / F.col("n"))
            / (F.sum("pos").over(tot).cast("double") / F.sum("n").over(tot)),
            6,
        ).alias("lift"),
        F.round(
            F.sum("pos").over(w).cast("double") / F.sum("pos").over(tot), 6
        ).alias("cum_gain"),
    ).orderBy(F.col("decile").desc())


DECILE_LIFT_SQL = f"""
WITH tiled AS (
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
           NTILE({_LIFT_K}) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
),
per AS (
    SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
    FROM tiled GROUP BY decile
)
SELECT decile, n, pos,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS rate,
       ROUND((CAST(pos AS DOUBLE) / n)
             / (CAST(SUM(pos) OVER () AS DOUBLE) / SUM(n) OVER ()), 6) AS lift,
       ROUND(CAST(SUM(pos) OVER (ORDER BY decile DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
             / SUM(pos) OVER (), 6) AS cum_gain
FROM per
ORDER BY decile DESC
"""


QUERIES = {
    "bootstrap_ci_mean": bootstrap_ci_mean,
    "ab_test_proportions": ab_test_proportions,
    "harmonic_centrality": harmonic_centrality,
    "containment_join": containment_join,
    "decile_lift_table": decile_lift_table,
}

ORACLES = {
    "bootstrap_ci_mean": BOOTSTRAP_CI_MEAN_SQL,
    "ab_test_proportions": AB_TEST_SQL,
    "harmonic_centrality": _harmonic_sql(),
    "containment_join": _containment_sql(),
    "decile_lift_table": DECILE_LIFT_SQL,
}
