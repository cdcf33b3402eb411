"""Wave-15 operator coherence: cross-modal score sanity, time-split
model-eval replay, and the metadata-audit census identity."""

from collections import Counter, defaultdict

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave15
from waterbear_spark.queries.tables import table


def test_cross_modal_scores_are_consistent(spark):
    rows = wave15.dedup_cross_modal(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["jaccard"] <= 1.0
        assert -1.0 <= r["cosine"] <= 1.0
        assert abs(r["hybrid"] - round(r["jaccard"] + r["cosine"], 6) / 2) < 1e-12
    hybrids = [r["hybrid"] for r in rows]
    assert hybrids == sorted(hybrids, reverse=True)


def test_markov_accuracy_matches_python_replay(spark):
    got = {
        r["cur"]: (r["n_test"], r["n_correct"])
        for r in wave15.markov_next_event_accuracy(spark, SF_SMOKE).collect()
    }
    per_user = defaultdict(list)
    for r in table(spark, SF_SMOKE, "events").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    cutoff = wave15._MK_CUTOFF
    train = Counter()
    test = Counter()
    for timeline in per_user.values():
        timeline.sort()
        for (ts, _, cur), (_, _, nxt) in zip(timeline, timeline[1:]):
            (train if str(ts) < cutoff else test)[(cur, nxt)] += 1
    model = {}
    by_cur = defaultdict(list)
    for (cur, nxt), n in train.items():
        by_cur[cur].append((-n, nxt))
    for cur, lst in by_cur.items():
        model[cur] = min(lst)[1]
    expect = defaultdict(lambda: [0, 0])
    for (cur, nxt), n in test.items():
        expect[cur][0] += n
        if model.get(cur) == nxt:
            expect[cur][1] += n
    assert got == {c: tuple(v) for c, v in expect.items()}
    # time-split sanity: both splits non-trivial
    assert sum(train.values()) > 0 and sum(test.values()) > 0


def test_lang_mismatch_census_consistent_with_lang_id(spark):
    from waterbear_spark.queries.textops import lang_id

    preds = lang_id(spark, SF_SMOKE).collect()
    expect = defaultdict(lambda: [0, 0, 0])
    for r in preds:
        e = expect[r["lang"]]
        e[0] += 1
        if r["predicted_lang"] == "und":
            e[2] += 1
        elif r["predicted_lang"] != r["lang"]:
            e[1] += 1
    got = {
        r["meta_lang"]: (r["n_docs"], r["n_mismatch"], r["n_undecided"])
        for r in wave15.lang_metadata_mismatch(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}
