"""Wave-28 invariants (round 8): the estimator audit must agree with a
pure-Python MinHash replay on every surfaced pair, and the threshold
sweep must be monotone in the threshold."""

import hashlib

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.llm import N_BANDS, N_HASHES
from waterbear_spark.queries.wave28 import (
    _SWEEP_TAUS,
    dedup_threshold_sweep,
    minhash_estimate_audit,
)

pytestmark = pytest.mark.usefixtures("spark")


def _doc_state(docs):
    """doc_id -> (shingle set, signature tuple, band keys)."""
    out = {}
    for d in docs:
        toks = [t for t in d["text"].lower().split() if t]
        if len(toks) < 3:
            continue
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        sig = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(N_HASHES)
        ]
        bands = {
            (b, sig[2 * b] + sig[2 * b + 1]) for b in range(N_BANDS)
        }
        out[d["doc_id"]] = (sh, sig, bands)
    return out


@pytest.fixture(scope="module")
def state(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    return _doc_state(docs)


def test_estimator_audit_matches_replay(spark, state):
    rows = minhash_estimate_audit(spark, SF_SMOKE).collect()
    # replay candidates: every pair sharing a band key
    by_band = {}
    for doc_id, (_, _, bands) in state.items():
        for bk in bands:
            by_band.setdefault(bk, []).append(doc_id)
    cand = set()
    for ids in by_band.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == cand
    for r in rows:
        sa, siga, _ = state[r["doc_a"]]
        sb, sigb, _ = state[r["doc_b"]]
        k = sum(1 for x, y in zip(siga, sigb) if x == y)
        jac = len(sa & sb) / len(sa | sb)
        assert r["sig_matches"] == k
        assert abs(r["est_jaccard"] - k / N_HASHES) < 1e-9
        assert abs(r["exact_jaccard"] - jac) < 1e-6
        assert abs(r["abs_err"] - abs(k / N_HASHES - jac)) < 1e-6


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        dedup_threshold_sweep(spark, SF_SMOKE).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == sorted(_SWEEP_TAUS)
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs"] for r in rows]
    # raising the threshold never admits more pairs or touches more docs
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert all(d <= 2 * p for p, d in zip(pairs, docs))
