"""The partition-parallel rewrites must be invariant to their tuning
knobs: a two-pass bucketed quantile returns the same answer for ANY
bucket width (including one giant bucket, which degenerates to the naive
plan), and the day-stitched sweeps match regardless of how rows fall
across split boundaries. Oracle checks prove equality to the naive SQL
at the default knobs; these tests prove the knob doesn't matter.
"""

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import relational_ext


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("width", [500.0, 30000.0, 10_000_000.0])
def test_weighted_median_invariant_to_bucket_width(spark, monkeypatch, width):
    baseline = _rows(relational_ext.weighted_median_price(spark, SF_SMOKE))
    monkeypatch.setattr(relational_ext, "_WMED_BUCKET", width)
    assert _rows(relational_ext.weighted_median_price(spark, SF_SMOKE)) == baseline


@pytest.mark.parametrize("width", [1000.0, 30000.0, 10_000_000.0])
def test_equidepth_invariant_to_bucket_width(spark, monkeypatch, width):
    baseline = _rows(relational_ext.equidepth_histogram(spark, SF_SMOKE))
    monkeypatch.setattr(relational_ext, "_EQD_WIDTH", width)
    assert _rows(relational_ext.equidepth_histogram(spark, SF_SMOKE)) == baseline


@pytest.mark.parametrize("block", [64, 8192, 1 << 40])
def test_key_islands_invariant_to_block(spark, monkeypatch, block):
    baseline = _rows(relational_ext.key_islands(spark, SF_SMOKE))
    monkeypatch.setattr(relational_ext, "_ISLAND_BLOCK", block)
    assert _rows(relational_ext.key_islands(spark, SF_SMOKE)) == baseline
