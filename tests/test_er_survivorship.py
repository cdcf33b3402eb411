"""ER survivorship saturation cap (round 7): components above
_ER_CLUSTER_CAP members are deterministically sub-blocked so
survivorship group width is bounded forever; smaller components are
bit-for-bit unaffected."""

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


def test_saturated_component_sub_blocks(spark):
    big = 3 * _ER_CLUSTER_CAP + 100  # nsub = 4
    g = _er_survivorship(_members(spark, [big, 7])).collect()
    split = [r for r in g if r["cluster_id"] < big]
    rest = [r for r in g if r["cluster_id"] >= big]
    # the small component is untouched
    assert len(rest) == 1 and rest[0]["n_members"] == 7
    # the hot component splits into exactly nsub non-empty hash blocks
    assert len(split) == 4
    assert sum(r["n_members"] for r in split) == big
    # every block is far below the unsplit size (hash-uniform ~ big/4);
    # the bound here is loose on purpose — the invariant is "bounded by
    # ~cap, not by the component", not a balls-in-bins tail estimate
    assert max(r["n_members"] for r in split) < 2 * _ER_CLUSTER_CAP
    # sub-block survivors still obey the max-price rule within their block
    members = {r["cluster_id"]: r for r in split}
    assert len(members) == 4  # distinct min-keys per block


def test_cap_boundary_exact(spark):
    # cap+1 members -> nsub = 2; cap members -> single block
    g1 = _er_survivorship(_members(spark, [_ER_CLUSTER_CAP + 1]))
    g0 = _er_survivorship(_members(spark, [_ER_CLUSTER_CAP]))
    assert g1.count() == 2
    assert g0.count() == 1
    assert g1.agg(F.sum("n_members")).collect()[0][0] == _ER_CLUSTER_CAP + 1
