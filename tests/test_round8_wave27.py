"""Wave-27 invariants (round 8): the novelty profile must match a
pure-Python first-occurrence replay; the quota manifest must be a true
per-source cap census; the hubness histogram must conserve vectors and
edges."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.wave27 import (
    _NOV_FP,
    _QUOTA,
    knn_hubness_audit,
    novelty_profile_by_source,
    quota_sample_manifest,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    ).collect()


def _doc_shingles(text):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < 3:
        return None
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_novelty_matches_python_replay(spark, docs):
    first = {}
    per_doc = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        sh = _doc_shingles(d["text"])
        if sh is None:
            continue
        per_doc[d["doc_id"]] = (d["source"], sh)
        for s in sh:
            first.setdefault(s, d["doc_id"])
    agg = {}
    for doc_id, (src, sh) in per_doc.items():
        n_first = sum(1 for s in sh if first[s] == doc_id)
        fp = (n_first * _NOV_FP) // len(sh)
        st = agg.setdefault(src, [0, 0, 0])
        st[0] += 1
        st[1] += fp
        st[2] += 1 if fp < _NOV_FP // 2 else 0
    got = novelty_profile_by_source(spark, SF_SMOKE).collect()
    assert {r["source"] for r in got} == set(agg)
    for r in got:
        n, s_fp, n_low = agg[r["source"]]
        assert r["n_docs"] == n
        assert abs(r["avg_novelty"] - round(s_fp / (n * _NOV_FP), 6)) < 1e-9
        assert abs(r["low_novelty_share"] - round(n_low / n, 6)) < 1e-9


def test_quota_manifest_census(spark, docs):
    got = {r["source"]: r for r in quota_sample_manifest(spark, SF_SMOKE).collect()}
    by_src = {}
    for d in docs:
        lot = hashlib.md5(f"cap|{d['doc_id']}".encode()).hexdigest()
        by_src.setdefault(d["source"], []).append((lot, d["doc_id"], d["n_chars"]))
    assert set(got) == set(by_src)
    for src, rows in by_src.items():
        rows.sort()
        kept = rows[:_QUOTA]
        r = got[src]
        assert r["n_docs"] == len(rows)
        assert r["kept"] == len(kept)
        assert r["cut"] == len(rows) - len(kept)
        assert r["kept_chars"] == sum(c for _, _, c in kept)
        assert r["cut_chars"] == sum(c for _, _, c in rows) - r["kept_chars"]


def test_hubness_conserves_vectors_and_edges(spark):
    rows = knn_hubness_audit(spark, SF_SMOKE).collect()
    n_vec = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    # every vector lands in exactly one indegree bucket
    assert sum(r["n_vectors"] for r in rows) == n_vec
    # each non-singleton vector emits exactly one NN edge, so total
    # in-degree == number of vectors with a cell-mate (<= n_vec)
    total_indeg = sum(r["indegree"] * r["n_vectors"] for r in rows)
    assert 0 < total_indeg <= n_vec
    assert all(r["indegree"] >= 0 for r in rows)
