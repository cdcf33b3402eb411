"""Wave-22 coherence: the index-balance audit must reconcile with the
shipped assignment, the coverage curve must be monotone and bounded,
and the norm audit's drift flags must match a numpy replay."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave22
from waterbear_spark.queries.llm import _ivf_cells
from waterbear_spark.queries.tables import table

pytestmark = pytest.mark.usefixtures("spark")


def test_ivf_balance_reconciles_with_assignment(spark):
    audit = wave22.ivf_balance_audit(spark, SF_SMOKE).collect()
    cells = _ivf_cells(spark, SF_SMOKE).collect()
    assert sum(r["n_vecs"] for r in audit) == len(cells)
    # every realized cell is counted in exactly one coarse row
    assert sum(r["n_cells"] for r in audit) == len({r["cell"] for r in cells})
    for r in audit:
        assert 1 <= r["min_cell"] <= r["max_cell"] <= r["n_vecs"]


def test_coverage_curve_monotone_and_bounded(spark):
    rows = {r["top_k"]: r for r in wave22.token_coverage_curve(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [10, 100, 1000]
    total = {r["total_tokens"] for r in rows.values()}
    assert len(total) == 1  # one corpus total on every row
    cov = [rows[k]["covered_tokens"] for k in (10, 100, 1000)]
    assert cov[0] <= cov[1] <= cov[2] <= total.pop()
    assert all(0 <= rows[k]["coverage_bp"] <= 10000 for k in rows)


def test_boilerplate_census_counts(spark):
    out = wave22.boilerplate_prefix_census(spark, SF_SMOKE).collect()
    assert 0 < len(out) <= 20
    # descending by n_docs, ties by prefix; every row a real share
    pairs = [(r["n_docs"], r["prefix"]) for r in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    assert all(r["n_docs"] >= 2 and 0 <= r["share_bp"] <= 10000 for r in out)


def test_embedding_norm_flags_match_numpy(spark):
    audit = {r["source"]: r for r in wave22.embedding_norm_audit(spark, SF_SMOKE).collect()}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in table(spark, SF_SMOKE, "embeddings").collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()
    }
    by_src: dict[str, list[int]] = {}
    for vid, v in emb.items():
        if vid in src:
            fp = int(np.floor(float(np.dot(v, v)) * 1_000_000 + 0.5))
            by_src.setdefault(src[vid], []).append(fp)
    for s, fps in by_src.items():
        mean = sum(fps) // len(fps)
        assert audit[s]["n_vecs"] == len(fps)
        assert audit[s]["mean_nrm2_fp"] == mean
        assert audit[s]["n_low"] == sum(1 for x in fps if 2 * x < mean)
        assert audit[s]["n_high"] == sum(1 for x in fps if x > 2 * mean)
