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
    wave12,
    wave13,
    wave14,
    wave15,
    wave16,
    wave17,
    wave18,
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
    **wave12.QUERIES,
    **wave13.QUERIES,
    **wave14.QUERIES,
    **wave15.QUERIES,
    **wave16.QUERIES,
    **wave17.QUERIES,
    **wave18.QUERIES,
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
    **wave12.ORACLES,
    **wave13.ORACLES,
    **wave14.ORACLES,
    **wave15.ORACLES,
    **wave16.ORACLES,
    **wave17.ORACLES,
    **wave18.ORACLES,
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
    # --- round 5: only semantics-changed (or brand-new) queries are
    # pinned; the least-recently-verified rotation below fills the rest
    # of the window with the ~82 never-driver-verified queries (they
    # sort as round 0) ---
    # spearman ranks rewritten onto the bucketed census scaffold (the
    # round-4 verdict's one perf-weak finding) — semantics identical but
    # the physical rank path is new, so re-verify:
    "spearman_price_quantity",
    # lorenz deciles now drop n_cust=0 spine rows (degenerate-input
    # oracle agreement fix, advice r4):
    "lorenz_curve_deciles",
    # mvhd scan now iterates hex hits with box-size validation
    # (advice r4):
    "multimodal_mp4_walk",
    # new this round: measured recall@k for both ANN paths vs the
    # brute-force truth (verdict r4 ask #6):
    "ann_recall_report",
    # new this round: SemDeDup on the IVF cells:
    "semdedup_cells",
    # new this round (wave 18): curation-funnel trio:
    "quality_gate_funnel",
    "epoch_allocation",
    "embedding_quantization_audit",
    # sum-of-squares term rebuilt on exact 128-bit floor division after
    # the round-5 sf1 sweep caught engine-divergent double->decimal
    # conversion at ~5e21 cents^2:
    "anova_oneway_dow",
    # shrinkage now normalizes IEEE -0.0 (sf1 subset-2 sweep catch):
    "target_encoding",
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
