"""Wave-20 coherence: the PQ audit against a per-subspace replay of its
own k-means, and the probe sweep against the shipped IVF assignment."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave20
from waterbear_spark.queries.llm import _ivf_cells
from waterbear_spark.queries.tables import table
from pyspark.sql import functions as F


def _emb(spark):
    return (
        table(spark, SF_SMOKE, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )


def test_pq_audit_matches_kmeans_replay(spark):
    emb = _emb(spark).persist()
    n = emb.count()
    dim = len(emb.first()["v"])
    width = dim // wave20._PQ_M
    got = wave20.pq_reconstruction_audit(spark, SF_SMOKE).collect()
    by = {(r["subspace"], r["code"]): r for r in got}
    mat = {r["vec_id"]: np.asarray(r["v"]) for r in emb.collect()}

    for m in range(wave20._PQ_M):
        sub = emb.select(
            "vec_id", F.slice("v", 1 + m * width, width).alias("v")
        )
        assigned, centroids = wave20._kmeans(sub, wave20._PQ_K, wave20._PQ_ITERS)
        rows = assigned.collect()
        # full partition: every vector has exactly one code per subspace
        assert len(rows) == n
        occ = sum(
            r["n_assigned"] for (mm, _), r in by.items() if mm == m
        )
        assert occ == n
        groups = {}
        for r in rows:
            code, err = r["code"], r["err"]
            # the chosen code is a true argmin of squared distance
            v = mat[r["vec_id"]][m * width : (m + 1) * width]
            dists = {
                cid: float(np.dot(v - c, v - c))
                for cid, c in ((cid, np.asarray(c)) for cid, c in centroids.items())
            }
            assert err <= min(dists.values()) + 1e-9
            assert abs(err - dists[code]) < 1e-9
            # engine-side DECIMAL(20,6) cast rounds half-up; replicate
            g = groups.setdefault(code, [])
            g.append(Decimal(repr(err)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
        for code, errs in groups.items():
            r = by[(m, code)]
            assert r["n_assigned"] == len(errs)
            expect = float(sum(errs)) / len(errs)
            assert abs(r["mse"] - round(expect, 6)) < 1e-9, (m, code)


def test_probe_sweep_consistent_with_shipped_index(spark):
    out = wave20.ann_ivf_probe_sweep(spark, SF_SMOKE).collect()
    assert len(out) == len(wave20._SWEEP_NPROBE) * wave20._SWEEP_K
    by = {(r["nprobe"], r["query_id"]): r for r in out}

    # nprobe=1 visits exactly the probe's own IVF cell (the assignment IS
    # argmin over the same centroids), so its candidate set equals the
    # shipped index's cell-mates
    cells = {r["vec_id"]: r["cell"] for r in _ivf_cells(spark, SF_SMOKE).collect()}
    for q in range(wave20._SWEEP_K):
        mates = sum(1 for v, c in cells.items() if c == cells[q] and v != q)
        assert by[(1, q)]["cand_n"] == mates, q

    # widening the sweep never loses candidates or recall, and recall is
    # hits/5 exactly
    for q in range(wave20._SWEEP_K):
        seq = [by[(np_, q)] for np_ in wave20._SWEEP_NPROBE]
        for a, b in zip(seq, seq[1:]):
            assert b["cand_n"] >= a["cand_n"]
            assert b["hits"] >= a["hits"]
        for r in seq:
            assert abs(r["recall_at_5"] - round(r["hits"] / 5.0, 4)) < 1e-12
            assert 0 <= r["hits"] <= 5
