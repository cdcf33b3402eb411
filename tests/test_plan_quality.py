"""Plan lint over the whole catalog: the physical plans must have the
shape we'd accept on a 1000-executor cluster — no cartesian products, no
accidental nested-loop joins, no row-at-a-time Python, and scans that
prune columns."""

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.catalog import QUERIES
pytestmark = pytest.mark.smoke  # <10-min certification subset

# queries whose semantics legitimately need a broadcast nested loop
# (theta-only join conditions); everything else must hash/sort-merge join
NESTED_LOOP_OK = {
    "embedding_topk",  # deliberate broadcast cross join against 5 query rows
    # probe spine: 5 probe ids × broadcast 3-row method list (plus the
    # embedding_topk truth subtree it reuses)
    "ann_recall_report",
    # |sources|-row relation × broadcast 1-row total and 1-row leftover
    "epoch_allocation",
    # scalar-subquery pattern: cross join against a broadcast 1-row aggregate
    "q11_important_parts",
    "q15_top_supplier",
    "q22_idle_customers",
    "kmv_distinct_sketch",
    # date-spine × event-type grid: a deliberate broadcast cross join of
    # two generated micro-relations (|types| × |days|)
    "gapfill_locf_daily",
    # per-lang floor: broadcast 1-row scalar joined against the corpus
    "lang_balance_resample",
    # corpus-size N: broadcast 1-row scalar against the tf relation
    "tfidf_top_terms",
    # suppressed-group count: broadcast 1-row scalar against kept cube rows
    "kanon_suppressed_cube",
    # corpus-total scalar against the vocabulary relation
    "lm_quality_score",
    # unigram/bigram-total scalars against the collocation relation
    "bigram_pmi",
    # budget and water-level: broadcast 1-row scalars on a sources-sized frame
    "mixing_water_fill",
    # census assembly: three 1-row aggregates joined into one output row
    "incremental_dedup_merge",
    # grand-total scalar against the contingency cells
    "chi2_lang_source",
    # pooled ntile boundaries: one broadcast array row against the corpus
    "quantile_normalize_lengths",
    # max-day boundary: broadcast 1-row scalar gating the 7x contribution
    # fan-out (the join itself is an equi-join-free filter)
    "rolling_distinct_users",
    # totals row: broadcast 1-row scalar against the k-row top-k relation
    "skew_key_census",
    # sqrt-mass denominator: broadcast 1-row scalar against |sources| rows
    "temperature_mix_weights",
    # leakage census: broadcast 1-row scalar against the 3-split census
    "leakage_free_split",
    # anchor date: broadcast 1-row scalar against the customer relation
    "rfm_segments",
    # corpus N/avgdl: broadcast 1-row scalar against the tf relation
    "bm25_search",
    # order-count scalar against the top-k pair relation
    "itemset_pair_lift",
    # date-spine × event-type grid, as in gapfill_locf_daily
    "gapfill_interpolate_daily",
    # digit-total scalar against the 9-row digit relation
    "benford_first_digit",
    # series-length scalar against the |days| micro-relation
    "theil_sen_revenue_trend",
    # sample-size scalars against the per-value cumulative relation
    "ks_test_order_status",
    # global max-date scalar against the per-customer lifetime relation
    "kaplan_meier_risk",
    # vote-total scalar against the |nations| micro-relation
    "largest_remainder_allocation",
    # census assembly: four 1-row aggregates joined into one output row
    "bloom_prune_join",
    # month-spine × segment grid (1-row bounds explode, 5-row broadcast)
    "semi_additive_balance",
    # global-prior scalar against the 5-row category relation
    "target_encoding",
    # sketch report assembly: three 1-row relations joined into one row
    "kmv_set_ops",
    # replicate report x 1-row full-mean scalar
    "bootstrap_ci_mean",
    # two 1-row arm aggregates joined into one readout row
    "ab_test_proportions",
    # ntile boundaries: one broadcast array row against the facts
    # (same operator as quantile_normalize_lengths)
    "decile_lift_table",
    # date-span midpoint: broadcast 1-row scalar against the facts
    "psi_stability",
    "diff_in_diff",
    # DCG x 1-row IDCG relation
    "retrieval_eval_ndcg",
    # order-count scalar against the top-k triple relation
    "frequent_triples",
    # ntile boundaries broadcast against the facts (same operator as
    # decile_lift_table)
    "calibration_brier",
    # dual suppression census: 1-row scalar against released groups
    "ldiversity_release",
    # prediction x 1-row actual-count confirmation
    "join_size_product_sum",
    # 1-row train-total scalar broadcast onto the exploded held-out
    # bigrams (OOV floor needs the total on every row)
    "bigram_backoff_perplexity",
    # 1-row node/reached censuses against the 1-row conflict report
    "bipartite_check",
    # weight-total and shortfall scalars against the strata relation
    "neyman_allocation",
    # two 1-row cell aggregates joined into one readout row
    "welch_ttest_segments",
    # census self-join on a theta condition (q1 < q2) over the bounded
    # (quantity x discount) value domain, plus 1-row tie/total scalars
    "kendall_tau_qty_disc",
    # two 1-row distinct-set counts joined into one readout row
    "ngram_novelty_rate",
    # grand-total/shape scalar (n, r, c) against the contingency cells
    "cramers_v_lang_source",
    # 1-row triangle count joined onto the 1-row wedge census
    "clustering_coefficient",
    # QI-groups x global-band-spine grid: a deliberate broadcast cross
    # join of two domain-bounded micro-relations
    "tcloseness_release",
    # 1-row corpus-total scalar broadcast onto the 256-row hashed-bucket
    # relation (the smoothing denominators need the totals on every row)
    "dsir_importance_weights",
    # 5-probe x K-centroid ranking grid and the (nprobe x probe) spine:
    # deliberate broadcast cross joins of bounded micro-relations
    "ann_ivf_probe_sweep",
    # the same 5-probe x K-centroid coarse grid plus the 5 x (M x K)
    # ADC lookup table: both sides bounded micro-relations
    "ann_ivfpq_adc_search",
    # inherits the ADC chain's bounded grids; its own additions are
    # equi-joins on the R-row shortlist
    "ann_refine_rerank",
    # brute-force audit: corpus scan x broadcast 5-probe relation (the
    # same deliberate shape as embedding_topk's truth set)
    "matryoshka_recall",
    # inherits the ADC chain's bounded grids plus the same brute-truth
    # corpus x 5-probe broadcast pass
    "ann_refine_recall",
    # IVF coarse assignment: corpus scan x broadcast 1-row packed
    # centroid relation (k1 structs), argmin row-local — the r7
    # two-level quantizer's no-plan-literal assignment shape
    "ann_ivf_kmeans",
    "semdedup_cells",
    # audits the same index -> inherits the packed-centroid cross join
    "ivf_balance_audit",
    # NN histogram over the same index -> inherits the same cross join
    "knn_hubness_audit",
    # 1-row corpus-total scalar against the shared-prefix relation
    "boilerplate_prefix_census",
    # per-width census assembly: three 1-row aggregates joined per row
    "contamination_ngram_sweep",
    # r12: six 1-row single-column distinct-count aggregates attached to
    # the 1-row base profile by broadcast (replaced the expand-x7 fused
    # aggregate — 2.4x at sf0.1)
    "profile_table",
    # 1-row corpus-token-total scalar onto the vocabulary relation
    # (the perplexity_buckets shape)
    "doremi_mix_weights",
    # corpus scan x 5 broadcast probes (the embedding_topk shape)
    "hard_negative_mining",
    # 1-row normalization-total scalar onto the |labels| relation
    "class_balance_weights",
    # 1-row corpus-token-total scalar onto the vocabulary relation
    "perplexity_buckets",
    # ntile boundaries: one broadcast array row against the scored docs
    # (same operator as quantile_normalize_lengths / decile_lift_table),
    # plus the 1-row token-total scalar on the 4-row phase relation
    "curriculum_schedule",
}


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        for name, fn in QUERIES.items()
    }


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_no_accidental_nested_loop_joins(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in NESTED_LOOP_OK
    ]
    assert offenders == []


# queries that deliberately exercise the row-wise Python surface
# (UDTF table functions); everything else stays JVM-side or Arrow-batched
ROWWISE_PYTHON_OK = {"udtf_tokenize"}


def test_no_rowwise_python(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in ROWWISE_PYTHON_OK
    ]
    assert offenders == []


def test_no_rdd_api_in_source():
    """The DataFrame API is the contract: touching ``df.rdd`` (even just
    ``getNumPartitions``) forces an RDD conversion / analysis pass on the
    driver and drops out of Catalyst. Nothing in the engine may use it."""
    import pathlib
    import re

    import waterbear_spark

    root = pathlib.Path(waterbear_spark.__file__).parent
    pat = re.compile(r"\.rdd\b")
    offenders = [
        f"{p.relative_to(root)}:{i}"
        for p in root.rglob("*.py")
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line)
    ]
    assert offenders == []


# queries that join a PER-DISTINCT-TOKEN (vocabulary-shaped) relation
# against another relation: the vocabulary is unbounded under Heaps' law
# (~1e8 types at 100 TB of web text), so a forced F.broadcast of it would
# OOM executors at scale.  These queries must leave that join UNHINTED
# (AQE demotes it to broadcast when the vocabulary happens to be small).
# Hinted CROSS joins (the 1-row corpus-total scalar idiom) stay legal;
# bounded token cuts (top-K vocab, the <=3-term BM25 query, 256 hashed
# DSIR buckets, the 10-doc benchmark shingle set) are not in this list.
VOCAB_RELATION_QUERIES = {
    "perplexity_buckets",
    "doremi_mix_weights",
    "lm_quality_score",
    "tfidf_top_terms",
    "unigram_entropy_by_source",
    "token_coverage_curve",
    "bigram_pmi",
    "vocab_top_terms",
}


@pytest.fixture(scope="module")
def optimized_plans(spark):
    return {
        name: QUERIES[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
        for name in VOCAB_RELATION_QUERIES
    }


def test_no_broadcast_hint_on_vocabulary_relations(optimized_plans):
    import re

    # a broadcast HINT on a keyed join shows up in the optimized logical
    # plan as e.g. "Join Inner, (tok#1 = tok#2), rightHint=(strategy=broadcast)";
    # hinted Cross joins (1-row scalars) are the only allowed hint shape
    offenders = [
        f"{n}: {line.strip()[:100]}"
        for n, p in optimized_plans.items()
        for line in p.splitlines()
        if "strategy=broadcast" in line and re.search(r"Join (?!Cross)", line)
    ]
    assert offenders == []


def test_scans_prune_columns(plans):
    # lineitem has 11 columns; no query needs more than 8 of them
    for name, plan in plans.items():
        for line in plan.splitlines():
            if "FileScan parquet" in line and "lineitem" in line and "ReadSchema" in line:
                schema_part = line.split("ReadSchema:")[1]
                n_cols = schema_part.count(":")
                assert n_cols <= 8, f"{name} reads {n_cols} lineitem columns"
