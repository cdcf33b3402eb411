"""Wave-19 coherence: python replays of the Gopher repetition census,
the DSIR weight arithmetic, the S-curve planner's closed form, and the
fertility audit's integer sums."""

import hashlib
import math
import re
from collections import Counter

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave19
from waterbear_spark.queries.tables import table


def _toks(text):
    return [t for t in text.lower().split() if t]


def _doc_dup(toks, n):
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(grams)
    total = sum(c * len(g) for g, c in cnt.items())
    dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
    return dup, total


def test_gopher_repetition_matches_python_replay(spark):
    docs = table(spark, SF_SMOKE, "documents").collect()
    agg = {}
    for r in docs:
        toks = _toks(r["text"])
        d2, t2 = _doc_dup(toks, 2)
        d3, t3 = _doc_dup(toks, 3)
        n2, den2 = wave19._DUP2_THRESH
        n3, den3 = wave19._DUP3_THRESH
        flagged = d2 * den2 > t2 * n2 or d3 * den3 > t3 * n3
        a = agg.setdefault(r["source"], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += flagged
        a[2] += d2
        a[3] += t2
        a[4] += d3
        a[5] += t3
    got = wave19.gopher_repetition_filters(spark, SF_SMOKE).collect()
    assert len(got) == len(agg)
    for row in got:
        n_docs, n_flagged, d2, t2, d3, t3 = agg[row["source"]]
        assert row["n_docs"] == n_docs
        assert row["n_flagged"] == n_flagged
        assert row["dup2_frac"] == round(d2 / t2, 4)
        assert row["dup3_frac"] == round(d3 / t3, 4)
    # the census must discriminate: some duplication exists somewhere
    assert any(r["dup2_frac"] > 0 for r in got)


def _bucket(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % wave19._DSIR_BUCKETS


def test_dsir_weights_match_python_replay(spark):
    docs = table(spark, SF_SMOKE, "documents").collect()
    t_cnt = Counter()
    r_cnt = Counter()
    per_doc = {}
    for r in docs:
        hs = Counter(_bucket(t) for t in _toks(r["text"]))
        if r["source"] == wave19._DSIR_TARGET:
            t_cnt.update(hs)
        else:
            r_cnt.update(hs)
            per_doc[r["doc_id"]] = (r["source"], hs)
    T, R, V = sum(t_cnt.values()), sum(r_cnt.values()), wave19._DSIR_BUCKETS
    lr_fp = {
        h: math.floor(
            (math.log((t_cnt[h] + 1) / (T + V)) - math.log((r_cnt[h] + 1) / (R + V)))
            * wave19._DSIR_FP
            + 0.5
        )
        for h in range(V)
    }
    scored = sorted(
        (
            (-sum(c * lr_fp[h] for h, c in hs.items()), doc_id, src, hs)
            for doc_id, (src, hs) in per_doc.items()
        ),
    )[: wave19._DSIR_TOPK]
    got = wave19.dsir_importance_weights(spark, SF_SMOKE).collect()
    assert len(got) == wave19._DSIR_TOPK
    for row, (neg_w, doc_id, src, hs) in zip(got, scored):
        assert row["doc_id"] == doc_id
        assert row["source"] == src
        assert row["n_toks"] == sum(hs.values())
        assert row["weight"] == round(-neg_w / wave19._DSIR_FP, 4)
    # target-slice docs never appear in the resampling head
    assert all(r["source"] != wave19._DSIR_TARGET for r in got)


def test_lsh_band_planner_closed_form(spark):
    from waterbear_spark.queries.llm import N_HASHES

    got = wave19.lsh_band_planner(spark, SF_SMOKE).collect()
    assert [r["bands"] for r in got] == wave19._PLAN_SPLITS
    for row in got:
        b, r = row["bands"], row["rows_per_band"]
        assert b * r == N_HASHES
        assert row["threshold"] == round((1.0 / b) ** (1.0 / r), 4)
        for s in wave19._PLAN_S:
            assert row[f"p_at_{int(s * 100)}"] == round(
                1.0 - (1.0 - s**r) ** b, 4
            )
    # exactly one recommended split, and its threshold is the closest to tau
    best = [r for r in got if r["rank_for_tau"] == 1]
    assert len(best) == 1
    assert best[0]["tau_dist"] == min(r["tau_dist"] for r in got)
    # the S-curve is monotone in s for every split
    for row in got:
        ps = [row[f"p_at_{int(s * 100)}"] for s in wave19._PLAN_S]
        assert ps == sorted(ps)


def test_fertility_audit_matches_python_replay(spark):
    docs = table(spark, SF_SMOKE, "documents").collect()
    pat = re.compile(wave19._BPE_ISH)
    agg = {}
    for r in docs:
        a = agg.setdefault((r["lang"], r["source"]), [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(r["text"].encode("utf-8"))
        a[2] += len(_toks(r["text"]))
        a[3] += len(pat.findall(r["text"]))
    got = wave19.tokenizer_fertility_audit(spark, SF_SMOKE).collect()
    assert len(got) == len(agg)
    for row in got:
        n_docs, s_bytes, s_words, s_bpe = agg[(row["lang"], row["source"])]
        assert row["n_docs"] == n_docs
        assert row["s_bytes"] == s_bytes
        assert row["s_bpe"] == s_bpe
        assert row["fertility"] == round(s_bpe / s_words, 4)
        assert row["bytes_per_token"] == round(s_bytes / s_bpe, 4)
        # a BPE-ish pre-tokenizer never merges across whitespace
        assert row["fertility"] >= 1.0
