"""Round-3 wave-11 operators: exact percentile SLAs, bipartiteness
testing, Neyman allocation, and the classical ANOVA / Welch tests.

Operator families the catalog didn't cover yet:

* ``percentile_sla_by_type`` — EXACT p50/p90/p99 per event type by the
  distributed value-cumulative scaffold (percentile_disc semantics:
  smallest value whose cumulative count reaches ceil(q*n)) — the
  latency-SLA report, computed without any per-group sort.
* ``bipartite_check`` — is the trade graph 2-colorable? Color by BFS
  parity from the minimum node, count conflicting edges (odd cycles);
  the graph-sanity primitive behind matching/scheduling algorithms.
* ``neyman_allocation`` — optimal stratified-sampling allocation
  n_h ∝ N_h * σ_h (Neyman 1934) with largest-remainder integerization
  ([[largest_remainder_allocation]]'s rule) — how a 100 TB profiler
  decides how many rows to sample from each stratum.
* ``anova_oneway_dow`` — one-way ANOVA F across day-of-week revenue
  groups (exact integer-cents moments, closed-form F).
* ``welch_ttest_segments`` — Welch's unequal-variance t-test between
  two customer segments' order values (the robust default two-sample
  test; completes the family next to [[mannwhitney_order_status]] /
  [[ks_test_order_status]] / [[ab_test_proportions]]).

Float determinism follows the house rules in ``tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from waterbear_spark.queries.tables import table


# ---------------------------------------------------------------------------
# Exact percentile SLA per group
# ---------------------------------------------------------------------------

_SLA_QS = (50, 90, 99)
_SLA_BUCKET = 1000  # value-range bucket width (cents) for the scaffold


def percentile_sla_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per event type — the latency-SLA
    table — via the distributed cumulative-rank scaffold
    ([[ks_test_order_status]]'s): per-(type, cents) counts, value-range
    bucket prefix sums, within-bucket cumulative windows; the
    percentile is then PERCENTILE_DISC — the smallest value whose
    cumulative count reaches ceil(q * n) — picked by one aggregate.
    No per-group global sort exists anywhere, so a skewed group costs
    its bucket, not a single-partition sweep.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    per_value = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pb = (F.col("v") - F.pmod(F.col("v"), _SLA_BUCKET)) / _SLA_BUCKET
    pv = per_value.withColumn("pb", pb.cast("long"))
    bucket = pv.groupBy("event_type", "pb").agg(F.sum("cnt").alias("bc"))
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bucket.select(
        "event_type",
        "pb",
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
    )
    w_in = (
        Window.partitionBy("event_type", "pb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = pv.join(offs, ["event_type", "pb"]).select(
        "event_type", "v", (F.col("off") + F.sum("cnt").over(w_in)).alias("cum")
    )
    tot = per_value.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    joined = cums.join(F.broadcast(tot), "event_type")
    aggs = [F.max("n").alias("n")]
    for q in _SLA_QS:
        rank = F.ceil(F.col("n") * q / 100.0)
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= rank, F.col("v"))).cast("double")
                / 100.0
            ).alias(f"p{q}")
        )
    return joined.groupBy("event_type").agg(*aggs).orderBy("event_type")


def _sla_sql() -> str:
    cols = ", ".join(
        f"CAST(PERCENTILE_DISC({q / 100.0}) WITHIN GROUP (ORDER BY v) AS DOUBLE)"
        f" / 100.0 AS p{q}"
        for q in _SLA_QS
    )
    return f"""
SELECT event_type, COUNT(*) AS n, {cols}
FROM (
    SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Bipartiteness check
# ---------------------------------------------------------------------------

_BP_ROUNDS = 4


def bipartite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the nation trade graph 2-colorable? Color each node by the
    parity of its BFS distance from the minimum node ({r} min-plus
    rounds, the [[bfs_shortest_paths]] loop), then count edges whose
    endpoints share a color — each is an odd cycle witness; zero means
    bipartite (within the reached subgraph). Output: one row with node,
    edge, reached, and conflict counts plus the verdict.

    Scale: the edge list is bounded at 2x top-K rows BY CONSTRUCTION, so
    the BFS rounds and the conflict census run row-locally over one
    packed edge array (``operators/microg.py``) — the distributed plan
    keeps only the star-join aggregate that builds the graph, replacing
    {r} broadcast+shuffle micro-stages plus three count/conflict joins
    with two projections.
    """
    from waterbear_spark.operators import microg
    from waterbear_spark.queries.graph import _und_edges

    packed = microg.pack_edges(_und_edges(spark, sf_dir))
    edges0 = F.col("edges")
    # the isNotNull filter drops MIN(src)'s one all-NULL seed on an
    # empty edge list, so an empty graph reports n_reached = 0, not a
    # phantom NULL-keyed node riding through every BFS round
    dist0 = F.filter(
        microg.bfs_distances(
            edges0,
            _BP_ROUNDS,
            F.array_min(F.transform(edges0, lambda e: e["src"])),
        ),
        lambda x: x["node"].isNotNull(),
    )
    # generator barrier: materialize the BFS fold once — an expression
    # referenced by several output columns is re-evaluated per reference
    # (the interpreted-HOF trap documented in microg.py)
    s1 = packed.select(
        F.explode(
            F.array(F.struct(edges0.alias("edges"), dist0.alias("dist")))
        ).alias("s")
    )
    edges = F.col("s.edges")
    dist = F.col("s.dist")

    def _d(u: Column) -> Column:
        return microg._lookup(dist, u, "node", "d")

    def _fold(acc: Column, e: Column) -> Column:
        ds, dd = _d(e["src"]), _d(e["dst"])
        reached = ds.isNotNull() & dd.isNotNull()
        return F.struct(
            (acc["er"] + F.when(reached, F.lit(1)).otherwise(F.lit(0))).alias(
                "er"
            ),
            (
                acc["conf"]
                + F.when(
                    reached & (F.pmod(ds, F.lit(2)) == F.pmod(dd, F.lit(2))),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("conf"),
        )

    # one traversal counts reached directed edges and same-color
    # (odd-cycle witness) directed edges; both halve to undirected counts
    stats = F.aggregate(
        edges,
        F.struct(
            F.lit(0).cast("long").alias("er"),
            F.lit(0).cast("long").alias("conf"),
        ),
        _fold,
    )
    n_nodes = F.size(
        F.array_distinct(F.transform(edges, lambda e: e["src"]))
    ).cast("long")
    out = s1.select(
        F.explode(
            F.array(
                F.struct(
                    n_nodes.alias("n_nodes"),
                    F.size(dist).cast("long").alias("n_reached"),
                    stats.alias("st"),
                )
            )
        ).alias("t")
    )
    # SUM over zero reached edges is NULL in the join formulation (and
    # the oracle); mirror that exactly so the verdict stays NULL there
    n_conflicts = F.when(
        F.col("t.st.er") > 0, (F.col("t.st.conf") / 2).cast("bigint")
    )
    return out.select(
        F.col("t.n_nodes").alias("n_nodes"),
        F.col("t.n_reached").alias("n_reached"),
        (F.col("t.st.er") / 2).cast("bigint").alias("n_edges_reached"),
        n_conflicts.alias("n_conflicts"),
        (n_conflicts == 0).alias("is_bipartite"),
    )

bipartite_check.__doc__ = bipartite_check.__doc__.format(r=_BP_ROUNDS)


def _bipartite_sql() -> str:
    from waterbear_spark.queries.graph import _EDGES_CTE

    ctes = []
    prev = "d0"
    for i in range(1, _BP_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS (
    SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT e.dst AS node, p.d + 1 AS d FROM {prev} p JOIN und e ON p.node = e.src
    ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    return f"""
WITH {_EDGES_CTE},
d0 AS (SELECT node, 0 AS d FROM (SELECT MIN(src) AS node FROM und)
       WHERE node IS NOT NULL),
{",".join(ctes)},
color AS (SELECT node, d % 2 AS c FROM {prev}),
conf AS (
    SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_edges_reached,
           CAST(SUM(CASE WHEN cs.c = cd.c THEN 1 ELSE 0 END) / 2 AS BIGINT)
               AS n_conflicts
    FROM und
    JOIN color cs ON und.src = cs.node
    JOIN color cd ON und.dst = cd.node
),
nodes AS (SELECT COUNT(DISTINCT src) AS n_nodes FROM und),
reached AS (SELECT COUNT(*) AS n_reached FROM color)
SELECT n_nodes, n_reached, n_edges_reached, n_conflicts,
       n_conflicts = 0 AS is_bipartite
FROM conf CROSS JOIN nodes CROSS JOIN reached
"""


# ---------------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------------

_NEY_BUDGET = 10_000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_h proportional to
    N_h * sigma_h over order-priority strata (sigma from exact
    integer-cents moments), integerized by the largest-remainder rule
    ([[largest_remainder_allocation]]), which apportions the budget of
    {b} exactly. Each allocation is then capped at N_h (a stratum can't
    give more rows than it has); a binding cap leaves its surplus
    unspent rather than silently re-spreading it — single-pass semantics
    a distributed profiler can honor in one shuffle — and is flagged in
    the ``capped`` column so the caller can see exactly where and why
    sum(n_sample) < budget.

    Determinism: sigma uses decimal(38,0) cents moments and one sqrt;
    the weight shares quantize to integer parts-per-million BEFORE the
    remainder rank, so the apportionment compares exact integers only.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    per = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum(cents).cast("decimal(38,0)").alias("s1"),
        F.sum(cents * cents).cast("decimal(38,0)").alias("s2"),
    )
    nd = F.col("n_pop").cast("double")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
    ) / (nd - 1.0) / 10_000.0
    weighted = per.select(
        "o_orderpriority",
        "n_pop",
        F.round(F.sqrt(var), 4).alias("sigma"),
        # weight in exact micro-units: floor(N*sigma * 100) as bigint
        F.floor(nd * F.sqrt(var) * 100.0).cast("bigint").alias("w"),
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    quota = weighted.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_pop",
        "sigma",
        F.expr(f"(w * {_NEY_BUDGET}) div tw").alias("floor_n"),
        F.pmod(F.col("w") * _NEY_BUDGET, F.col("tw")).alias("rem"),
    )
    short = quota.agg(
        (F.lit(_NEY_BUDGET) - F.sum("floor_n")).alias("short")
    )
    wr = Window.orderBy(F.col("rem").desc(), "o_orderpriority")
    return (
        quota.crossJoin(F.broadcast(short))
        .select(
            "o_orderpriority",
            "n_pop",
            "sigma",
            F.least(
                F.col("floor_n")
                + (F.row_number().over(wr) <= F.col("short")).cast("bigint"),
                F.col("n_pop"),
            ).alias("n_sample"),
            (
                F.col("floor_n")
                + (F.row_number().over(wr) <= F.col("short")).cast("bigint")
                > F.col("n_pop")
            ).alias("capped"),
        )
        .orderBy("o_orderpriority")
    )

neyman_allocation.__doc__ = neyman_allocation.__doc__.format(b=_NEY_BUDGET)


NEYMAN_SQL = f"""
WITH per AS (
    SELECT o_orderpriority, COUNT(*) AS n_pop,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))
                    * CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2
    FROM orders GROUP BY o_orderpriority
),
weighted AS (
    SELECT o_orderpriority, n_pop,
           ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n_pop AS DOUBLE))
                      / (CAST(n_pop AS DOUBLE) - 1.0) / 10000.0), 4) AS sigma,
           CAST(FLOOR(CAST(n_pop AS DOUBLE)
                * SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                        / CAST(n_pop AS DOUBLE))
                       / (CAST(n_pop AS DOUBLE) - 1.0) / 10000.0) * 100.0) AS BIGINT) AS w
    FROM per
),
tot AS (SELECT SUM(w) AS tw FROM weighted),
quota AS (
    SELECT o_orderpriority, n_pop, sigma,
           CAST(w * {_NEY_BUDGET} // tw AS BIGINT) AS floor_n,
           w * {_NEY_BUDGET} % tw AS rem
    FROM weighted CROSS JOIN tot
),
short AS (SELECT {_NEY_BUDGET} - SUM(floor_n) AS short FROM quota)
SELECT o_orderpriority, n_pop, sigma,
       LEAST(floor_n + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, o_orderpriority)
                                 <= (SELECT short FROM short)
                            THEN 1 ELSE 0 END, n_pop) AS n_sample,
       floor_n + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, o_orderpriority)
                           <= (SELECT short FROM short)
                      THEN 1 ELSE 0 END > n_pop AS capped
FROM quota
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# One-way ANOVA across day-of-week
# ---------------------------------------------------------------------------

def anova_oneway_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test: does mean order value differ by day of
    week? Between/within sums of squares from exact integer-cents
    moments per group (decimal128), closed-form F with its degrees of
    freedom — the multi-group generalization the two-sample tests in
    this catalog can't express. One combinable aggregate per group,
    then a 7-row fold.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    per = o.groupBy(
        F.dayofweek(F.col("o_orderdate").cast("timestamp_ntz")).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("decimal(38,0)").alias("s1"),
        F.sum(cents * cents).cast("decimal(38,0)").alias("s2"),
    )
    # floor(s1^2 / n) in EXACT 128-bit integer arithmetic: subtract the
    # remainder so the decimal division has an integral true quotient
    # (its scale-6 HALF_UP is then exact). The sf1 sweep (round 5)
    # caught why no double may touch this term: at ~5e21 cents^2 the
    # engines' double->decimal conversions disagree (Spark renders the
    # shortest round-trip digits, DuckDB the exact dyadic value), so any
    # round()/cast() of the double detour hash-diverges. The remainder
    # subtraction keeps this exact at ANY group count; only decimal
    # overflow (s1^2 >= 1e38, ~1e17 dollars of group revenue) bounds it.
    s1sq = F.col("s1") * F.col("s1")
    per = per.withColumn(
        "q", ((s1sq - s1sq % F.col("n")) / F.col("n")).cast("decimal(38,0)")
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s1").cast("decimal(38,0)").alias("g1"),
        F.sum("s2").cast("decimal(38,0)").alias("g2"),
        F.sum("q").cast("decimal(38,0)").alias("sum_q"),
    )
    # BOTH sums of squares are computed as exact decimal DIFFERENCES
    # before any double appears: subtracting the ~1e22 cents^2 moments in
    # double would sink the (much smaller) within/between signal below
    # the ulp (~1e7 there) — catastrophic cancellation that zeroed
    # ss_within on an adversarial high-mean/low-variance input. The
    # floor remainders bias each SS by < k cents^2, identically in both
    # engines.
    g1sq = F.col("g1") * F.col("g1")
    ssb_fp = F.col("sum_q") - (
        (g1sq - g1sq % F.col("n_tot")) / F.col("n_tot")
    ).cast("decimal(38,0)")
    ssw_fp = F.col("g2") - F.col("sum_q")
    ss_between = ssb_fp.cast("double") / 10_000.0
    ss_within = ssw_fp.cast("double") / 10_000.0
    n = F.col("n_tot").cast("double")
    k = F.col("k").cast("double")
    f_stat = F.when(
        ssw_fp > 0, (ss_between / (k - 1)) / (ss_within / (n - k))
    )  # zero within-variance => F undefined, NULL on both engines
    # ss_* are emitted UNROUNDED: the exact decimal differences convert
    # to double identically in both engines (single int128 conversion),
    # while a final ROUND(x, 2) at ss_within ~ 1e16 is exactly where the
    # engines diverge (Spark's BigDecimal round is an identity there;
    # DuckDB's multiply/round/divide perturbs one ulp — the round-5 sf1
    # sweep finding)
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n"),
        ss_between.alias("ss_between"),
        ss_within.alias("ss_within"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n_tot") - F.col("k")).cast("bigint").alias("df2"),
        F.round(f_stat, 6).alias("f_stat"),
    )


ANOVA_SQL = """
WITH per AS (
    SELECT DAYOFWEEK(o_orderdate) + 1 AS dow, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))
                    * CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2
    FROM orders GROUP BY 1
),
tot AS (
    SELECT COUNT(*) AS k, SUM(n) AS n_tot,
           CAST(SUM(s1) AS HUGEINT) AS g1,
           CAST(SUM(s2) AS HUGEINT) AS g2,
           SUM(CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
               // CAST(n AS HUGEINT)) AS sum_q
    FROM per
),
fp AS (
    SELECT k, n_tot,
           sum_q - (g1 * g1 // CAST(n_tot AS HUGEINT)) AS ssb_fp,
           g2 - sum_q AS ssw_fp
    FROM tot
)
SELECT CAST(k AS BIGINT) AS n_groups, CAST(n_tot AS BIGINT) AS n,
       CAST(ssb_fp AS DOUBLE) / 10000.0 AS ss_between,
       CAST(ssw_fp AS DOUBLE) / 10000.0 AS ss_within,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(n_tot - k AS BIGINT) AS df2,
       CASE WHEN ssw_fp > 0 THEN
           ROUND((CAST(ssb_fp AS DOUBLE) / 10000.0 / (CAST(k AS DOUBLE) - 1))
                 / (CAST(ssw_fp AS DOUBLE) / 10000.0
                    / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE))), 6)
       END AS f_stat
FROM fp
"""


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------

_WT_A = "AUTOMOBILE"
_WT_B = "MACHINERY"


def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on order value between the
    '{a}' and '{b}' customer segments, with the Welch-Satterthwaite
    effective degrees of freedom — the robust default when variances
    (and group sizes) differ. Exact cents moments; the t and df are
    closing IEEE expressions.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    per = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment").isin(_WT_A, _WT_B))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).cast("decimal(38,0)").alias("s1"),
            F.sum(cents * cents).cast("decimal(38,0)").alias("s2"),
        )
    )

    def side(name, tag):
        return per.filter(F.col("c_mktsegment") == name).select(
            F.col("n").alias(f"n{tag}"),
            F.col("s1").alias(f"s1{tag}"),
            F.col("s2").alias(f"s2{tag}"),
        )

    j = side(_WT_A, "a").crossJoin(F.broadcast(side(_WT_B, "b")))

    def mean(tag):
        return F.col(f"s1{tag}").cast("double") / F.col(f"n{tag}") / 100.0

    def var_over_n(tag):
        n = F.col(f"n{tag}").cast("double")
        s1 = F.col(f"s1{tag}").cast("double")
        s2 = F.col(f"s2{tag}").cast("double")
        return (s2 - s1 * s1 / n) / (n - 1.0) / 10_000.0 / n

    se2 = var_over_n("a") + var_over_n("b")
    t = (mean("a") - mean("b")) / F.sqrt(se2)
    df = (se2 * se2) / (
        var_over_n("a") * var_over_n("a") / (F.col("na").cast("double") - 1)
        + var_over_n("b") * var_over_n("b") / (F.col("nb").cast("double") - 1)
    )
    return j.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(mean("a"), 4).alias("mean_a"),
        F.round(mean("b"), 4).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 2).alias("df_welch"),
    )

welch_ttest_segments.__doc__ = welch_ttest_segments.__doc__.format(a=_WT_A, b=_WT_B)


def _welch_cell(name: str, tag: str) -> str:
    return (
        f"(SELECT n AS n{tag}, s1 AS s1{tag}, s2 AS s2{tag} FROM per"
        f" WHERE c_mktsegment = '{name}')"
    )


WELCH_SQL = f"""
WITH per AS (
    SELECT c.c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS DECIMAL(19,0))
                    * CAST(ROUND(o.o_totalprice * 100) AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('{_WT_A}', '{_WT_B}')
    GROUP BY c.c_mktsegment
),
j AS (SELECT * FROM {_welch_cell(_WT_A, "a")} CROSS JOIN {_welch_cell(_WT_B, "b")})
SELECT na AS n_a, nb AS n_b,
       ROUND(CAST(s1a AS DOUBLE) / na / 100.0, 4) AS mean_a,
       ROUND(CAST(s1b AS DOUBLE) / nb / 100.0, 4) AS mean_b,
       ROUND((CAST(s1a AS DOUBLE) / na / 100.0 - CAST(s1b AS DOUBLE) / nb / 100.0)
             / SQRT((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / na)
                        / (na - 1.0) / 10000.0 / na
                    + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / nb)
                        / (nb - 1.0) / 10000.0 / nb), 6) AS t_stat,
       ROUND(((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / na)
                     / (na - 1.0) / 10000.0 / na
                 + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / nb)
                     / (nb - 1.0) / 10000.0 / nb) * ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / na)
                     / (na - 1.0) / 10000.0 / na
                 + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / nb)
                     / (nb - 1.0) / 10000.0 / nb)
             / ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / na)
                    / (na - 1.0) / 10000.0 / na
                * ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / na)
                    / (na - 1.0) / 10000.0 / na) / (na - 1.0)
                + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / nb)
                    / (nb - 1.0) / 10000.0 / nb
                * ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / nb)
                    / (nb - 1.0) / 10000.0 / nb) / (nb - 1.0)), 2) AS df_welch
FROM j
"""


QUERIES = {
    "percentile_sla_by_type": percentile_sla_by_type,
    "bipartite_check": bipartite_check,
    "neyman_allocation": neyman_allocation,
    "anova_oneway_dow": anova_oneway_dow,
    "welch_ttest_segments": welch_ttest_segments,
}

ORACLES = {
    "percentile_sla_by_type": _sla_sql(),
    "bipartite_check": _bipartite_sql(),
    "neyman_allocation": NEYMAN_SQL,
    "anova_oneway_dow": ANOVA_SQL,
    "welch_ttest_segments": WELCH_SQL,
}
