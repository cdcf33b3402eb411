"""Round-9 wave-30 invariants (cross-engine values are covered by the
oracle harness; these pin the structural contracts)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave30
from waterbear_spark.queries.llm import _ivf_index
from waterbear_spark.queries.tables import table


@pytest.fixture(scope="module")
def manifest(spark):
    return wave30.ann_index_manifest(spark, SF_SMOKE).collect()


def test_manifest_covers_all_components(spark, manifest):
    assert [r["component"] for r in manifest] == [
        "ivf_cells",
        "ivf_centroids",
        "pq_codebooks",
        "pq_codes",
    ]


def test_manifest_counts_consistent_with_index(spark, manifest):
    rows = {r["component"]: r for r in manifest}
    _cells, _cent, params = _ivf_index(spark, SF_SMOKE)
    # every vector has exactly one cell row; codes carry M rows/vector
    assert rows["ivf_cells"]["n_rows"] == params["n"]
    assert rows["pq_codes"]["n_rows"] == params["n"] * 4
    # realized cells never exceed the k1*k2 reachable cells
    assert rows["ivf_cells"]["n_keys"] <= params["k1"] * params["k2"]
    # codebooks hold one centroid per (m, code) — rows == distinct keys
    assert rows["pq_codebooks"]["n_rows"] == rows["pq_codebooks"]["n_keys"]


def test_degree_census_accounts_every_shingled_doc(spark):
    census = wave30.near_dup_degree_census(spark, SF_SMOKE).collect()
    n_shingled = (
        table(spark, SF_SMOKE, "documents")
        .filter(F.size(F.split(F.lower("text"), r"\s+")) >= 3)
        .count()
    )
    # every degree is >= 0 and the histogram masses sum to the shingled
    # doc count (degree 0 included — the census must not drop isolates)
    assert all(r["degree"] >= 0 for r in census)
    assert sum(r["n_docs"] for r in census) <= n_shingled
    assert sum(r["n_docs"] for r in census) > 0
    assert any(r["degree"] == 0 for r in census)


def test_curriculum_phases_partition_the_corpus(spark):
    out = wave30.curriculum_schedule(spark, SF_SMOKE).collect()
    assert [r["phase"] for r in out] == [1, 2, 3, 4]
    n_docs = (
        table(spark, SF_SMOKE, "documents")
        .filter(F.length("text") > 0)
        .count()
    )
    assert sum(r["n_docs"] for r in out) == n_docs
    # quality is ordered: phase 1 holds the most fluent quartile
    assert out[0]["min_quality"] >= out[-1]["max_quality"]
    # the cumulative share closes at exactly 1
    assert out[-1]["cum_token_share"] == 1.0
    assert out[-1]["cum_tokens"] == sum(r["n_tokens"] for r in out)


def test_covariance_is_upper_triangle_with_nonneg_diagonal(spark):
    rows = wave30.embedding_covariance(spark, SF_SMOKE).collect()
    d = max(r["j"] for r in rows) + 1
    assert len(rows) == d * (d + 1) // 2
    assert all(r["i"] <= r["j"] for r in rows)
    # variances (diagonal) are non-negative up to rounding
    assert all(r["cov"] >= -1e-6 for r in rows if r["i"] == r["j"])
