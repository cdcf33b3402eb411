"""Wave-24 coherence: contamination must shrink as the n-gram widens,
and the DoReMi mixture must be a proper upweight of the hardest source."""

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave24

pytestmark = pytest.mark.usefixtures("spark")


def test_contamination_shrinks_with_width(spark):
    rows = {
        r["ngram_n"]: r
        for r in wave24.contamination_ngram_sweep(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == [3, 5, 8]
    # a shared 8-gram contains shared 5- and 3-grams, and eligibility
    # only shrinks with n, so contaminated counts are non-increasing
    assert (
        rows[3]["contaminated_docs"]
        >= rows[5]["contaminated_docs"]
        >= rows[8]["contaminated_docs"]
    )
    for r in rows.values():
        assert 0 <= r["contaminated_docs"] <= r["train_docs"]
        assert 0 <= r["contaminated_bp"] <= 10000
        assert r["bench_ngrams"] > 0


def test_doremi_weights_are_proper_mixture(spark):
    rows = wave24.doremi_mix_weights(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    # integer-bp mixture: sums to ~10000 (floor rounding loses < |sources| bp)
    total = sum(r["weight_bp"] for r in rows)
    assert 10000 - len(rows) <= total <= 10000
    # the easiest source has excess 0; weights rank with excess NLL
    easiest = min(rows, key=lambda r: r["mean_nll"])
    assert easiest["excess_nll"] == 0.0
    by_excess = sorted(rows, key=lambda r: r["excess_nll"])
    weights = [r["weight_bp"] for r in by_excess]
    assert weights == sorted(weights)
    assert all(r["excess_nll"] >= 0 for r in rows)
