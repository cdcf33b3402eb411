"""ER survivorship saturation cap (round 7, contract restored round 8):
components above _ER_CLUSTER_CAP members are deterministically
sub-blocked so the FIRST-stage aggregation width is bounded forever, and
a second per-component reduce over the tiny partial relation restores
one golden record per resolved entity — the output is the same as an
uncapped per-component survivorship at every scale."""

import pytest
from pyspark.sql import functions as F

from waterbear_spark.queries.mining import _ER_CLUSTER_CAP, _er_survivorship

pytestmark = pytest.mark.usefixtures("spark")


def _members(spark, sizes):
    """Synthetic (p_partkey, p_name, p_retailprice, component) with the
    given component sizes; keys are globally unique, prices vary so the
    max-price survivor is unambiguous."""
    rows, key = [], 0
    for comp_idx, size in enumerate(sizes):
        base = key
        for i in range(size):
            rows.append((key, f"part {comp_idx}-{i}", 900.0 + (key % 97), base))
            key += 1
    return spark.createDataFrame(
        rows, "p_partkey bigint, p_name string, p_retailprice double, component bigint"
    )


def test_small_components_single_block(spark):
    g = _er_survivorship(_members(spark, [3, 5, _ER_CLUSTER_CAP])).collect()
    # one golden record per component, cluster_id = min member key
    assert len(g) == 3
    assert sorted(r["cluster_id"] for r in g) == [0, 3, 8]
    assert sorted(r["n_members"] for r in g) == [3, 5, _ER_CLUSTER_CAP]
    for r in g:
        # survivor is the max-price member (ties impossible here)
        assert r["golden_price"] == max(
            900.0 + (k % 97)
            for k in range(r["cluster_id"], r["cluster_id"] + r["n_members"])
        )


def test_saturated_component_one_golden_record(spark):
    big = 3 * _ER_CLUSTER_CAP + 100  # first stage sub-blocks into nsub = 4
    g = _er_survivorship(_members(spark, [big, 7])).collect()
    # the second-stage reduce restores ONE golden record per component,
    # regardless of the internal sub-blocking
    assert len(g) == 2
    by_id = {r["cluster_id"]: r for r in g}
    assert by_id[0]["n_members"] == big
    assert by_id[big]["n_members"] == 7
    # the survivor is the GLOBAL max-price member of the hot component
    # (not a per-block winner)
    assert by_id[0]["golden_price"] == max(900.0 + (k % 97) for k in range(big))
    # price spread is the global min..max spread
    prices = [900.0 + (k % 97) for k in range(big)]
    assert by_id[0]["price_spread"] == round(max(prices) - min(prices), 2)


def test_cap_boundary_exact(spark):
    # cap+1 members (first stage sub-blocks) and cap members (single
    # block) both emit exactly one golden record with the full census
    g1 = _er_survivorship(_members(spark, [_ER_CLUSTER_CAP + 1]))
    g0 = _er_survivorship(_members(spark, [_ER_CLUSTER_CAP]))
    assert g1.count() == 1
    assert g0.count() == 1
    assert g1.agg(F.sum("n_members")).collect()[0][0] == _ER_CLUSTER_CAP + 1
