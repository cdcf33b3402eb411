"""Wave-21 coherence: python/numpy replays of the contrastive mining
ranks, the effective-number weights, the NLL tercile census, and the
dup-matrix rollup's consistency with the shipped pair operator."""

import math
from collections import Counter, defaultdict

import numpy as np

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave21
from waterbear_spark.queries.tables import table


def test_hard_negative_mining_matches_numpy(spark):
    emb = table(spark, SF_SMOKE, "embeddings").collect()
    mat = {r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64) for r in emb}
    lab = {r["vec_id"]: r["label"] for r in emb}
    got = wave21.hard_negative_mining(spark, SF_SMOKE).collect()
    assert len(got) == wave21._HN_PROBES * 2 * wave21._HN_TOPK
    by = defaultdict(list)
    for r in got:
        by[(r["query_id"], r["role"])].append((r["rank"], r["vec_id"], r["cos"]))
    for q in range(wave21._HN_PROBES):
        qv = mat[q]
        qn = math.sqrt(float(np.dot(qv, qv)))
        scored = defaultdict(list)
        for v, x in mat.items():
            if v == q:
                continue
            cos = round(float(np.dot(qv, x)) / (qn * math.sqrt(float(np.dot(x, x)))), 4)
            role = "positive" if lab[v] == lab[q] else "hard_negative"
            scored[role].append((-cos, v))
        for role, cand in scored.items():
            expect = sorted(cand)[: wave21._HN_TOPK]
            rows = sorted(by[(q, role)])
            assert [v for _, v in expect] == [v for _, v, _ in rows], (q, role)
            for (neg_cos, _), (_, _, cos) in zip(expect, rows):
                assert abs(cos - (-neg_cos)) < 2e-4  # numpy dot vs fold, then round
    # a positive of a probe is never the probe itself
    assert all(r["vec_id"] != r["query_id"] for r in got)


def test_class_balance_weights_closed_form(spark):
    counts = Counter(
        r["label"] for r in table(spark, SF_SMOKE, "embeddings").collect()
    )
    got = wave21.class_balance_weights(spark, SF_SMOKE).collect()
    assert len(got) == len(counts)
    b = wave21._CB_BETA
    raw_fp = {
        lab: math.floor(wave21._CB_FP / ((1 - b**n) / (1 - b)) + 0.5)
        for lab, n in counts.items()
    }
    tot = sum(raw_fp.values())
    for r in got:
        n = counts[r["label"]]
        assert r["n"] == n
        assert r["eff_n"] == round((1 - b**n) / (1 - b), 4)
        assert r["weight"] == round(raw_fp[r["label"]] * len(counts) / tot, 6)
    # rarer classes weigh more, and weights average to 1
    srt = sorted(got, key=lambda r: r["n"])
    ws = [r["weight"] for r in srt]
    assert ws == sorted(ws, reverse=True)
    assert abs(sum(ws) / len(ws) - 1.0) < 1e-3


def test_perplexity_buckets_match_python_replay(spark):
    docs = table(spark, SF_SMOKE, "documents").collect()
    vocab = Counter()
    toks_by_doc = {}
    for r in docs:
        ts = [t for t in r["text"].lower().split() if t]
        toks_by_doc[r["doc_id"]] = (r["lang"], ts)
        vocab.update(ts)
    t = sum(vocab.values())
    nll_fp = {
        w: math.floor(-math.log(c / t) * wave21._PB_FP + 0.5)
        for w, c in vocab.items()
    }
    per_lang = defaultdict(list)
    for doc_id, (lang, ts) in toks_by_doc.items():
        if not ts:
            continue
        s = sum(nll_fp[w] for w in ts)
        per_lang[lang].append((s / len(ts), doc_id, s, len(ts)))
    agg = {}
    for lang, rows in per_lang.items():
        rows.sort()
        n = len(rows)
        # NTILE(3): first (n mod 3) buckets get ceil(n/3)
        sizes = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
        pos = 0
        for i, size in enumerate(sizes):
            chunk = rows[pos : pos + size]
            pos += size
            if not chunk:
                continue
            agg[(lang, i + 1)] = (
                len(chunk),
                sum(s for _, _, s, _ in chunk),
                sum(k for _, _, _, k in chunk),
                min(m for m, _, _, _ in chunk),
                max(m for m, _, _, _ in chunk),
            )
    got = wave21.perplexity_buckets(spark, SF_SMOKE).collect()
    assert len(got) == len(agg)
    for r in got:
        n_docs, ss, sn, lo, hi = agg[(r["lang"], r["bucket"])]
        assert r["n_docs"] == n_docs
        assert r["mean_nll"] == round(ss / sn / wave21._PB_FP, 4)
        assert r["nll_lo"] == round(lo / wave21._PB_FP, 4)
        assert r["nll_hi"] == round(hi / wave21._PB_FP, 4)
    # terciles are ordered: bucket 1 is the head (lowest NLL)
    for lang in {r["lang"] for r in got}:
        ms = [r["mean_nll"] for r in sorted(got, key=lambda r: r["bucket"])
              if r["lang"] == lang]
        assert ms == sorted(ms)


def test_dup_matrix_consistent_with_pair_operator(spark):
    from waterbear_spark.queries.llm import dedup_near_minhash

    pairs = dedup_near_minhash(spark, SF_SMOKE).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for p in pairs:
        a, b = sorted((src[p["doc_a"]], src[p["doc_b"]]))
        agg[(a, b)][0] += 1
        agg[(a, b)][1] += math.floor(p["jaccard"] * 10000 + 0.5)
    got = wave21.cross_source_dup_matrix(spark, SF_SMOKE).collect()
    assert len(got) == len(agg)
    total = 0
    for r in got:
        n, s = agg[(r["source_a"], r["source_b"])]
        assert r["n_pairs"] == n
        assert r["mean_jaccard"] == round(s / n / 10000.0, 4)
        total += n
    # every verified pair lands in exactly one matrix cell
    assert total == len(pairs)
