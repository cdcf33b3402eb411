"""Wave-23 coherence: sweep tables must be monotone and conserve
totals; the entropy must match an exact fixed-point python replay."""

import math

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave23
from waterbear_spark.queries.tables import table

pytestmark = pytest.mark.usefixtures("spark")


def test_length_sweep_monotone(spark):
    rows = {r["min_chars"]: r for r in wave23.length_filter_sweep(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [100, 200, 400, 800]
    docs = [rows[t]["docs_kept"] for t in (100, 200, 400, 800)]
    chars = [rows[t]["chars_kept"] for t in (100, 200, 400, 800)]
    assert docs == sorted(docs, reverse=True)
    assert chars == sorted(chars, reverse=True)
    assert all(0 <= rows[t]["docs_bp"] <= 10000 for t in rows)


def test_padding_waste_conserves_tokens(spark):
    rows = {r["seq_len"]: r for r in wave23.padding_waste_sweep(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [512, 1024, 2048]
    for L, r in rows.items():
        assert r["n_seqs"] * L == r["total_tokens"] + r["padded_tokens"]
        assert r["n_seqs"] >= r["n_docs"]  # every doc needs >= 1 sequence
        assert 0 <= r["waste_bp"] < 10000
    # fewer tokens per sequence -> fewer padded slots overall
    assert rows[512]["padded_tokens"] <= rows[1024]["padded_tokens"] <= rows[2048]["padded_tokens"]


def test_entropy_matches_fixed_point_replay(spark):
    got = {r["source"]: r for r in wave23.unigram_entropy_by_source(spark, SF_SMOKE).collect()}
    counts: dict[str, dict[str, int]] = {}
    for row in table(spark, SF_SMOKE, "documents").select("source", "text").collect():
        d = counts.setdefault(row["source"], {})
        for tok in row["text"].lower().split():
            if tok:
                d[tok] = d.get(tok, 0) + 1
    for src, d in counts.items():
        t = sum(d.values())
        s_fp = sum(c * math.floor(math.log(c) * 1_000_000 + 0.5) for c in d.values())
        h = (math.floor(math.log(t) * 1_000_000 + 0.5) - s_fp / t) / 1_000_000
        assert got[src]["n_types"] == len(d)
        assert got[src]["n_tokens"] == t
        assert abs(got[src]["entropy_nats"] - round(h, 4)) < 1e-9
        assert 0 <= got[src]["efficiency"] <= 1
