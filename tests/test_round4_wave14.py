"""Wave-14 operator coherence: credit conservation, clustering-identity,
tolerance semantics, and centroid replay."""

import math
from collections import defaultdict

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave14
from waterbear_spark.queries.tables import table


def test_multitouch_credit_is_conserved(spark):
    rows = wave14.attribution_multitouch(spark, SF_SMOKE).collect()
    assert {r["channel"] for r in rows} <= {"click", "view"}
    # every attributed purchase hands out exactly 1.0 of credit under
    # BOTH models, so the channel totals sum to the same number — the
    # count of purchases with >= 1 touch
    lin_total = sum(r["linear_credit"] for r in rows)
    dec_total = sum(r["decay_credit"] for r in rows)
    assert abs(lin_total - dec_total) < 1e-6
    assert abs(lin_total - round(lin_total)) < 1e-6  # integer purchases


def test_clustering_coefficient_identity(spark):
    r = wave14.clustering_coefficient(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["global_clustering"] <= 1.0
    # identity check against the per-nation triangle census: each
    # triangle contributes membership to 3 nations
    from waterbear_spark.queries.graph import triangle_count_nations

    memberships = sum(
        row["n_triangles"]
        for row in triangle_count_nations(spark, SF_SMOKE).collect()
    )
    assert memberships == 3 * r["n_triangles"]


def test_asof_tolerance_nulls_stale_matches(spark):
    tol = {
        r["event_id"]: (r["fresh_purchase_id"], r["staleness_min"])
        for r in wave14.asof_tolerance_join(spark, SF_SMOKE).collect()
    }
    # pure-Python replay of "most recent purchase at-or-before, fresh
    # only within 60 minutes"
    events = table(spark, SF_SMOKE, "events").collect()
    purchases = defaultdict(list)
    for r in events:
        if r["event_type"] == "purchase":
            purchases[r["user_id"]].append((r["ts"], r["event_id"]))
    for v in purchases.values():
        v.sort()
    n_fresh = n_stale = n_none = 0
    for r in events:
        if r["event_type"] != "click":
            continue
        cands = [
            (ts, eid)
            for ts, eid in purchases.get(r["user_id"], [])
            if ts <= r["ts"]
        ]
        got = tol[r["event_id"]]
        if not cands:
            assert got == (None, None)
            n_none += 1
            continue
        ts, eid = max(cands)
        diff_us = int((r["ts"] - ts).total_seconds() * 1_000_000)
        if diff_us <= wave14._ASOF_TOL_MIN * 60_000_000:
            assert got == (eid, diff_us // 60_000_000)
            n_fresh += 1
        else:
            assert got == (None, None)
            n_stale += 1
    assert n_fresh > 0 and n_stale > 0  # both branches exercised


def test_centroid_drift_matches_numpy_replay(spark):
    got = {
        r["label"]: (r["n_vecs"], r["cos_to_global"])
        for r in wave14.embedding_centroid_drift(spark, SF_SMOKE).collect()
    }
    per = defaultdict(list)
    for r in table(spark, SF_SMOKE, "embeddings").collect():
        per[r["label"]].append(r["embedding"])
    dims = len(next(iter(per.values()))[0])
    all_vecs = [v for vs in per.values() for v in vs]
    gcent = [sum(v[d] for v in all_vecs) / len(all_vecs) for d in range(dims)]
    for label, vs in per.items():
        cent = [sum(v[d] for v in vs) / len(vs) for d in range(dims)]
        dot = sum(a * b for a, b in zip(cent, gcent))
        cos = dot / (
            math.sqrt(sum(a * a for a in cent))
            * math.sqrt(sum(b * b for b in gcent))
        )
        n, got_cos = got[label]
        assert n == len(vs)
        # the engine quantizes components to 6 decimals; the replay
        # doesn't, so compare to the quantization tolerance
        assert abs(got_cos - cos) < 1e-4, label
