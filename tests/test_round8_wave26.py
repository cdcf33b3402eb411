"""Wave-26 invariants (round 8): the two-stage refine must be a true
re-rank of the ADC shortlist by exact L2; matryoshka recall must be
exact at full dim; the Bloom screen must have zero false negatives and
its per-source audit must match a pure-Python replay."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.wave20 import _ADC_TOPK, _SWEEP_K
from waterbear_spark.queries.wave26 import (
    _BLOOM_BITS,
    _BLOOM_K,
    _MAT_DIMS,
    _REFINE_R,
    ann_refine_rerank,
    bloom_decontaminate,
    matryoshka_recall,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def refined(spark):
    return ann_refine_rerank(spark, SF_SMOKE).collect()


def test_refine_is_topk_by_exact_distance(refined, spark):
    by_q = {}
    for r in refined:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(_SWEEP_K))
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    for q, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _ADC_TOPK
        assert all(r["vec_id"] != q for r in rows)
        # stage-2 survivors come from the stage-1 shortlist
        assert all(1 <= r["adc_rank"] <= _REFINE_R for r in rows)
        # exact_dist is the true L2^2 between the raw vectors
        qv = emb[q]
        for r in rows:
            v = emb[r["vec_id"]]
            d = sum((a - b) * (a - b) for a, b in zip(qv, v))
            assert abs(r["exact_dist"] - d) < 1e-4
        dists = [r["exact_dist"] for r in rows]
        assert dists == sorted(dists)


def test_matryoshka_full_dim_recall_is_one(spark):
    rows = matryoshka_recall(spark, SF_SMOKE).collect()
    assert len(rows) == len(_MAT_DIMS) * _SWEEP_K
    for r in rows:
        assert 0 <= r["hits"] <= _SWEEP_K
        assert 0.0 <= r["recall_at_5"] <= 1.0
        if r["dim_kept"] == _MAT_DIMS[-1]:
            assert r["hits"] == _SWEEP_K and r["recall_at_5"] == 1.0


def _py_bloom_replay(docs):
    """Pure-Python replay of the Bloom screen over (doc_id, source, text)."""

    def shingles(text):
        toks = [t for t in text.lower().split() if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    def positions(s):
        return [
            int(hashlib.md5(f"{j}|{s}".encode()).hexdigest()[:15], 16)
            % _BLOOM_BITS
            for j in range(_BLOOM_K)
        ]

    bench = set()
    for d in docs:
        if d["doc_id"] < 10:
            bench |= shingles(d["text"])
    fbits = {p for s in bench for p in positions(s)}
    out = {}
    for d in docs:
        if d["doc_id"] < 10:
            continue
        for s in shingles(d["text"]):
            st = out.setdefault(d["source"], [0, 0, 0])
            st[0] += 1
            if all(p in fbits for p in positions(s)):
                st[1] += 1
            if s in bench:
                st[2] += 1
    return out


def test_bloom_audit_matches_python_replay(spark):
    got = {
        r["source"]: (r["probed"], r["bloom_pos"], r["exact_pos"], r["false_pos"])
        for r in bloom_decontaminate(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    want = _py_bloom_replay(docs)
    assert set(got) == set(want)
    for src, (probed, bloom, exact, false_pos) in got.items():
        assert (probed, bloom, exact) == tuple(want[src])
        assert false_pos == bloom - exact
        # a Bloom filter never false-negatives: every exact hit is flagged
        assert exact <= bloom
