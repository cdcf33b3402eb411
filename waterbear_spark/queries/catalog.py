"""Unified query registry: every implemented operator from SURVEY.md §2
-> (Spark callable, DuckDB oracle SQL). ``__spark_entry__.py`` re-exports
this for the driver harness.
"""

from __future__ import annotations

from waterbear_spark.functions import udfs
from waterbear_spark.queries import (
    behavior,
    corpusprep,
    graph,
    llm,
    mining,
    multimodal_queries,
    quality_queries,
    reconcile,
    relational,
    relational_ext,
    relational_more,
    retrieval,
    skew_queries,
    sqlsurface,
    streaming_queries,
    textops,
    timeseries,
    tpch_more,
    tpch_rest,
    wave3,
    wave4,
    wave5,
    wave6,
    wave7,
    wave8,
    wave9,
    wave10,
    wave11,
)

QUERIES = {
    **relational.QUERIES,
    **behavior.QUERIES,
    **relational_ext.QUERIES,
    **relational_more.QUERIES,
    **tpch_more.QUERIES,
    **tpch_rest.QUERIES,
    **graph.QUERIES,
    **llm.QUERIES,
    **textops.QUERIES,
    **quality_queries.QUERIES,
    **reconcile.QUERIES,
    **multimodal_queries.QUERIES,
    **streaming_queries.QUERIES,
    **skew_queries.QUERIES,
    **sqlsurface.QUERIES,
    **corpusprep.QUERIES,
    **timeseries.QUERIES,
    **retrieval.QUERIES,
    **mining.QUERIES,
    **wave3.QUERIES,
    **wave4.QUERIES,
    **wave5.QUERIES,
    **wave6.QUERIES,
    **wave7.QUERIES,
    **wave8.QUERIES,
    **wave9.QUERIES,
    **wave10.QUERIES,
    **wave11.QUERIES,
    # pandas_* queries intentionally exercise the Arrow/pandas UDF surface
    # (everything else in the catalog is UDF-free by policy)
    **udfs.QUERIES,
}

ORACLE_SQL = {
    **relational.ORACLES,
    **behavior.ORACLES,
    **relational_ext.ORACLES,
    **relational_more.ORACLES,
    **tpch_more.ORACLES,
    **tpch_rest.ORACLES,
    **graph.ORACLES,
    **llm.ORACLES,
    **textops.ORACLES,
    **quality_queries.ORACLES,
    **reconcile.ORACLES,
    **multimodal_queries.ORACLES,
    **streaming_queries.ORACLES,
    **skew_queries.ORACLES,
    **sqlsurface.ORACLES,
    **corpusprep.ORACLES,
    **timeseries.ORACLES,
    **retrieval.ORACLES,
    **mining.ORACLES,
    **wave3.ORACLES,
    **wave4.ORACLES,
    **wave5.ORACLES,
    **wave6.ORACLES,
    **wave7.ORACLES,
    **wave8.ORACLES,
    **wave9.ORACLES,
    **wave10.ORACLES,
    **wave11.ORACLES,
    **udfs.ORACLES,
}

# every oracle key must have a query twin (the reverse may lag for
# non-SQL-expressible ops, which get rows-only checks)
assert set(ORACLE_SQL) <= set(QUERIES), "oracle without query"

# The driver's correctness harness validates the catalog in dict order
# with a bounded window (first 50), so ordering decides which operators
# get cross-engine evidence each round. The rotation is a genuine
# round-robin driven by the committed evidence itself: each query's
# last-verified round is read from the CORRECTNESS_r*.json files at the
# repo root, and the catalog orders by
#
#   1. _PRIORITY — this round's new or semantics-changed queries, whose
#      prior evidence (if any) predates the change;
#   2. everything else, least-recently-driver-verified first (never
#      verified sorts as round 0), name as the deterministic tie-break.
#
# So every round the window covers: fixed/new queries, then the largest
# never-verified slice, then the STALEST previously-verified queries —
# no query parks permanently outside the window, and a regression in a
# long-validated query resurfaces once its evidence becomes the oldest.
# CORRECTNESS_LOCAL.json (scripts/check_oracle.py, full catalog) remains
# the per-round local certification on top.
_PRIORITY = [
    # --- driver window (first 50 of this list): round-2 verdict item 1,
    # with late-round-3 semantics changes prepended per the policy above
    # (the last 3 pre-change window entries — multimodal_jpeg_dims,
    # leakage_free_split, skew_key_census — shift just past the window
    # and lead the round-4 rotation) ---
    # 3 late-round-3 semantics changes (held-out backoff LM with a
    # reachable backoff branch + n_backoff/n_oov columns, Neyman `capped`
    # cap-surplus flag, bipartite empty-graph phantom-node guard):
    "bigram_backoff_perplexity",
    "neyman_allocation",
    "bipartite_check",
    # 4 round-3 semantics fixes whose prior evidence predates the fix
    # (max-tie earliest pick, floor-div blocking, zero-size NTILE tiles,
    # try_* census error paths):
    "downsample_minmax",
    "key_islands",
    "equidepth_histogram",
    "ansi_safe_arithmetic",
    # the 37 queries never driver-verified as of round 2 (VERDICT.md
    # 'What's missing' #1: the llm dedup/ANN family, graph.py, textops,
    # pandas/UDTF surface, profile/diff/checksum, q22, quality trio):
    "ann_hyperplane_buckets",
    "ann_ivf_kmeans",
    "approx_distinct",
    "bfs_shortest_paths",
    "checksum_orders",
    "decontaminate_overlap",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_near_minhash",
    "deterministic_split",
    "doc_chunking",
    "doc_fingerprint",
    "doc_quality",
    "embedding_knn_label",
    "embedding_topk",
    "fuzzy_join_parts",
    "label_propagation_communities",
    "lang_id",
    "ngram_jaccard_pairs",
    "pagerank_bipartite",
    "pandas_median_chars",
    "pandas_zscore_chars",
    "pii_redaction",
    "profile_table",
    "q22_idle_customers",
    "quality_quarantine_customer",
    "quality_report_customer",
    "quality_report_event",
    "repetition_signals",
    "simhash_near_dup",
    "table_diff_orders",
    "text_stats",
    "token_counting",
    "triangle_count_nations",
    "udtf_tokenize",
    "vocab_top_terms",
    # 9 flagship round-3 additions: the measured-recall report
    # (verdict item 3), the streaming batch-twins (verdict item 8), and
    # the headline new operators:
    "dedup_recall_report",
    "session_metrics_user",
    "dedup_stream_replay",
    "sentence_dedup_c4",
    "dedup_clusters_star",
    "bm25_search",
    # --- past the window from here (entries 51+): first in line for the
    # round-4 rotation, ahead of the remaining round-3 additions ---
    "multimodal_jpeg_dims",
    "leakage_free_split",
    "skew_key_census",
    # remaining round-3 additions, never driver-verified, so they
    # outrank the long-validated tail in rounds 4+:
    "dup_span_census",
    "bpe_pair_counts",
    "temperature_mix_weights",
    "acf_daily_revenue",
    "rolling_ols_slope",
    "recursive_org_rollup",
    "lateral_top_orders",
    "freshness_report",
    "rfm_segments",
    "inverted_index_postings",
    "sorted_neighborhood_pairs",
    "itemset_pair_lift",
    "cusum_changepoints",
    "stl_decompose_daily",
    "gapfill_interpolate_daily",
    "benford_first_digit",
    "holt_linear_forecast",
    "interval_bucket_overlap",
    "zipf_fit_tokens",
    "er_golden_records",
    "rolling_median_revenue",
    "theil_sen_revenue_trend",
    "ks_test_order_status",
    "gini_customer_revenue",
    "scd2_snapshot_at",
    "mannwhitney_order_status",
    "kcore_decomposition",
    "haversine_nearest_hub",
    "bool_bit_aggs",
    "hypothetical_rank",
    "semi_additive_balance",
    "feature_hashing",
    "status_streaks",
    "target_encoding",
    "point_in_polygon",
    "rake_keywords",
    "mase_forecast_accuracy",
    "kmv_set_ops",
    "bootstrap_ci_mean",
    "ab_test_proportions",
    "harmonic_centrality",
    "containment_join",
    "decile_lift_table",
    "roc_auc_exact",
    "psi_stability",
    "diff_in_diff",
    "retrieval_eval_ndcg",
    "fellegi_sunter_weights",
    "grid_dbscan",
    "rolling_origin_backtest",
    "frequent_triples",
    "event_trigrams",
    "late_arrival_census",
    "filter_clause_aggs",
    "set_ops_all",
    "group_order_by_all",
    "calibration_brier",
    "holt_winters_seasonal",
    "ldiversity_release",
    "trajectory_length",
    "join_size_product_sum",
    "rrf_fusion",
    "percentile_sla_by_type",
    "anova_oneway_dow",
    "welch_ttest_segments",
]


def _last_verified_round() -> dict[str, int]:
    """name -> latest driver round whose CORRECTNESS_r*.json records a
    passing check (hash match, or rows match for rows-only ops). A failed
    or absent check contributes nothing, so such queries sort as stale."""
    import json
    import re
    from pathlib import Path

    last: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            ok = res.get("hash_match") or (
                res.get("err") is None and res.get("rows_match")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _reorder(mapping: dict) -> dict:
    last = _last_verified_round()
    head = [k for k in _PRIORITY if k in mapping]
    rest = sorted(
        (k for k in mapping if k not in set(head)),
        key=lambda k: (last.get(k, 0), k),
    )
    return {k: mapping[k] for k in head + rest}


QUERIES = _reorder(QUERIES)
ORACLE_SQL = _reorder(ORACLE_SQL)
