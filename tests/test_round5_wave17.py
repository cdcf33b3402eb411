"""Wave-17 coherence: the ANN recall report must equal an independent
numpy replay of truth-set intersection, and multi-probe must dominate
single-probe."""

import math

import numpy as np

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave17
from waterbear_spark.queries.llm import _hyperplane_bucketed, _ivf_cells
from waterbear_spark.queries.tables import table


def _numpy_truth(spark):
    """Brute-force rounded-cosine top-5 per probe, replicating
    embedding_topk's membership rule (round 4dp, vec_id tie-break)."""
    rows = (
        table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    truth = {}
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        sims = np.round(mat @ mat[qi] / (nrm * nrm[qi]), 4)
        cand = [(float(-sims[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q]
        cand.sort()
        truth[q] = {vid for _, vid in cand[:5]}
    return truth


def test_ann_recall_report_matches_replay(spark):
    out = wave17.ann_recall_report(spark, SF_SMOKE).collect()
    assert len(out) == 20  # 4 methods x 5 probes
    by = {(r["method"], r["query_id"]): r for r in out}
    assert {m for m, _ in by} == {"ivf", "lsh", "lsh_mp1", "lsh_orband"}

    truth = _numpy_truth(spark)
    cells = {r["vec_id"]: r["cell"] for r in _ivf_cells(spark, SF_SMOKE).collect()}
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in _hyperplane_bucketed(spark, SF_SMOKE).select(
            "vec_id", "bucket"
        ).collect()
    }

    def members(assign, keys, q):
        return {v for v, k in assign.items() if k in keys and v != q}

    def orband_members(q):
        # 2 OR-bands of 4 bits: candidate iff either nibble matches
        qb = buckets[q]
        return {
            v
            for v, b in buckets.items()
            if v != q and (b & 15 == qb & 15 or b >> 4 == qb >> 4)
        }

    for q in range(5):
        expect = {
            "ivf": members(cells, {cells[q]}, q),
            "lsh": members(buckets, {buckets[q]}, q),
            "lsh_mp1": members(
                buckets, {buckets[q]} | {buckets[q] ^ (1 << j) for j in range(8)}, q
            ),
            "lsh_orband": orband_members(q),
        }
        for method, cand in expect.items():
            r = by[(method, q)]
            assert r["cand_n"] == len(cand), (method, q)
            assert r["hits"] == len(cand & truth[q]), (method, q)
            assert abs(r["recall_at_5"] - round(r["hits"] / 5.0, 4)) < 1e-12
            # superset monotonicity: widening probes never loses recall
        assert by[("lsh_mp1", q)]["hits"] >= by[("lsh", q)]["hits"]
        assert by[("lsh_mp1", q)]["cand_n"] >= by[("lsh", q)]["cand_n"]
        # the OR-band candidate set contains the exact-bucket set (a
        # full 8-bit match implies both nibbles match)
        assert by[("lsh_orband", q)]["hits"] >= by[("lsh", q)]["hits"]
        assert by[("lsh_orband", q)]["cand_n"] >= by[("lsh", q)]["cand_n"]


def test_semdedup_matches_numpy_replay(spark):
    from waterbear_spark.queries.llm import NEAR_COS_TAU

    got = {
        r["cell"]: (r["n_vecs"], r["n_dropped"], r["kept_rate"])
        for r in wave17.semdedup_cells(spark, SF_SMOKE).collect()
    }
    cells = {r["vec_id"]: r["cell"] for r in _ivf_cells(spark, SF_SMOKE).collect()}
    rows = (
        table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    )
    vecs = {r["vec_id"]: np.asarray(list(r["embedding"]), np.float64) for r in rows}
    by_cell = {}
    for vid, c in cells.items():
        by_cell.setdefault(c, []).append(vid)
    total_dropped = 0
    for c, ids in by_cell.items():
        ids.sort()
        dropped = set()
        for i, b in enumerate(ids):
            for a in ids[:i]:
                sim = round(
                    float(
                        vecs[a] @ vecs[b]
                        / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
                    ),
                    4,
                )
                if sim >= NEAR_COS_TAU:
                    dropped.add(b)
                    break
        n, nd, rate = got[c]
        assert n == len(ids) and nd == len(dropped), c
        assert abs(rate - round(1.0 - len(dropped) / len(ids), 4)) < 1e-12
        total_dropped += len(dropped)
    # the operator must discriminate on the planted near-dups
    assert total_dropped > 0


def test_ivf_two_level_params_scale():
    """The r6 verdict's scale-weak fix: total cells still grow with n
    (per-cell pair work stays O(n * target_cell)), but per-row
    assignment cost is k1 + k2 = O(sqrt(n / target)), never the full
    cell count, and the training sample grows like n/64 — so the
    quantizer is sub-quadratic end to end with bounded-size broadcast
    relations at every stage."""
    from waterbear_spark.queries.llm import (
        _IVF_TARGET_CELL,
        _IVF_TRAIN_PER_CELL,
        _ivf_k12,
        _ivf_kneed,
        _ivf_train_cap,
    )

    assert _ivf_kneed(0) == 8
    assert _ivf_kneed(500) == 8       # sf0.01
    assert _ivf_kneed(2000) == 8      # sf0.1
    assert _ivf_kneed(20000) == 10    # sf1
    assert _ivf_kneed(2048 * 8) == 8  # floor still binds at the boundary
    assert _ivf_kneed(2048 * 8 + 1) == 9
    assert _ivf_k12(500) == (3, 3)    # 9 cells at the floor
    assert _ivf_k12(20000) == (4, 3)  # 12 cells at sf1
    for n in (500, 20000, 10**6, 10**8, 10**9):
        kneed = _ivf_kneed(n)
        k1, k2 = _ivf_k12(n)
        # coverage: the two levels provide at least the needed cells,
        # without over-providing quadratically
        assert kneed <= k1 * k2 < 4 * kneed
        # per-cell pair work stays linear: cells keep near-target size
        assert n <= kneed * _IVF_TARGET_CELL or kneed == 8
        # per-row assignment cost is O(sqrt(kneed)), not O(kneed)
        assert k1 + k2 <= 2 * math.isqrt(kneed) + 3
        # the sample funds fine training: >= PER_CELL rows per cell
        assert _ivf_train_cap(n) >= _IVF_TRAIN_PER_CELL * kneed
    # the 1B-vector sanity the r6 verdict called impossible before:
    # ~489k cells reachable while each row scores only ~1400 centroids
    k1, k2 = _ivf_k12(10**9)
    assert k1 + k2 < _ivf_kneed(10**9) // 100
    assert _ivf_train_cap(10**9) < 10**9 // 50  # sample < 2% of corpus


def test_ivf_assignment_invariant_to_input_partitioning(spark, tmp_path):
    """The quantizer's determinism contract is partition-independence:
    decimal-exact centroid means and struct-min argmins cannot depend on
    how the scan splits, so the same corpus rewritten into 7 shuffled
    files must produce the identical assignment."""
    import os
    import shutil

    alt = tmp_path / "sfalt"
    alt.mkdir()
    for t in os.listdir(SF_SMOKE):
        if t != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMOKE, t), alt / t)
    (
        table(spark, SF_SMOKE, "embeddings")
        .repartition(7)  # different split count AND row order
        .write.mode("overwrite")
        .parquet(str(alt / "embeddings.parquet"))
    )
    base = {r["vec_id"]: r["cell"] for r in _ivf_cells(spark, SF_SMOKE).collect()}
    moved = {r["vec_id"]: r["cell"] for r in _ivf_cells(spark, str(alt)).collect()}
    assert base == moved
