"""Large-star/small-star connected components: equivalence to a
union-find reference on adversarial graph shapes, and the catalog twin's
agreement with the min-label implementation."""

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.operators.starcc import star_connected_components


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component id = min vertex id reachable
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, root)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.vertex, r.component)
        for r in star_connected_components(df).collect()
    }
    want = set(_union_find_components(edges).items())
    assert got == want


def test_chain_graph_high_diameter(spark):
    # worst case for min-label (O(diameter) rounds); star CC must still
    # produce min-vertex labels
    _check(spark, [(i, i + 1) for i in range(60)])


def test_star_and_cliques(spark):
    edges = [(0, i) for i in range(1, 10)]
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        _check(spark, edges)


def test_catalog_twin_matches_min_label(spark):
    from waterbear_spark.queries.llm import dedup_clusters, dedup_clusters_star

    a = sorted(
        map(tuple, dedup_clusters(spark, SF_SMOKE).collect())
    )
    b = sorted(
        map(tuple, dedup_clusters_star(spark, SF_SMOKE).collect())
    )
    assert a == b


def test_lateral_decorrelates_to_window_join(spark):
    """The LATERAL top-k must become a ranked window join, not a
    per-row nested loop."""
    from waterbear_spark.queries.sqlsurface import lateral_top_orders

    plan = (
        lateral_top_orders(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_above_threshold_driver_tier_matches(spark):
    # > SPARK_GRAFT_CC_LOCAL_MAX (512) distinct edges but under the
    # driver-tier bound: exercises the bounded-collect union-find
    rng = random.Random(11)
    seen = set()
    while len(seen) < 700:
        a, b = rng.randrange(500), rng.randrange(500)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    _check(spark, sorted(seen))


def test_above_threshold_distributed_path_matches(spark, monkeypatch):
    # driver tier disabled: exercises the alternating-star loop (the
    # 100 TB path) post-dispatch on the same 700-edge graph
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX", "0")
    rng = random.Random(11)
    seen = set()
    while len(seen) < 700:
        a, b = rng.randrange(500), rng.randrange(500)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    _check(spark, sorted(seen))


def test_local_and_distributed_paths_agree(spark, monkeypatch):
    # same 300-edge graph through all three engines: identical label
    # sets. Dispatch order is driver tier FIRST, so the row-local fold
    # only runs with the driver tier disabled (r11 advice: the old
    # first collect silently used the driver tier and compared it to
    # itself).
    rng = random.Random(13)
    seen = set()
    while len(seen) < 300:
        a, b = rng.randrange(150), rng.randrange(150)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(seen), "src long, dst long")
    # row-local fold: driver tier off, 300 <= LOCAL_MAX default (512)
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX", "0")
    local = {
        (r.vertex, r.component) for r in star_connected_components(df).collect()
    }
    # driver union-find: default driver tier dispatches first
    monkeypatch.delenv("SPARK_GRAFT_CC_DRIVER_MAX")
    driver = {
        (r.vertex, r.component) for r in star_connected_components(df).collect()
    }
    # alternating-star loop: both bounded tiers off
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX", "0")
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_MAX", "0")
    dist = {
        (r.vertex, r.component) for r in star_connected_components(df).collect()
    }
    assert local == driver == dist


def test_over_threshold_graph_never_collects(spark, monkeypatch):
    """The driver tier's collect is gated on the already-paid signature
    count: a graph over SPARK_GRAFT_CC_DRIVER_MAX edges must fall through
    to the next tier without _driver_components ever being invoked — an
    unbounded future consumer cannot silently collect (r11 verdict #8)."""
    from waterbear_spark.operators import starcc

    def _boom(*a, **k):
        raise AssertionError("driver tier collected an over-threshold graph")

    monkeypatch.setattr(starcc, "_driver_components", _boom)
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX", "10")
    edges = [(i, i + 1) for i in range(40)]  # 40 > 10: over the tier bound
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.vertex, r.component) for r in star_connected_components(df).collect()}
    want = set(_union_find_components(edges).items())
    assert got == want  # row-local fold tier (40 <= LOCAL_MAX) answered
    # and with BOTH bounded tiers off the star loop itself answers
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_MAX", "0")
    got2 = {(r.vertex, r.component) for r in star_connected_components(df).collect()}
    assert got2 == want


def test_long_chain_above_threshold(spark, monkeypatch):
    # 600-edge path graph: adversarial diameter for the distributed loop
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_MAX", "0")
    _check(spark, [(i, i + 1) for i in range(600)])
