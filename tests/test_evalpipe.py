"""Model-eval pipeline coherence: split disjointness, leakage-safe fit
(encoders recomputable from train rows alone), and the AUC/Brier/lift
numbers against a pure-Python replay."""

import hashlib
import math
from collections import defaultdict

from tests.conftest import SF_SMOKE
from waterbear_spark.evalpipe import _TE_M, _TRAIN_PCT, model_eval
from waterbear_spark.queries.tables import table


def _bucket(key: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16) % 100


def test_model_eval_matches_python_replay(spark):
    report, scored = model_eval(spark, SF_SMOKE)

    orders = table(spark, SF_SMOKE, "orders").collect()
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in table(spark, SF_SMOKE, "customer").collect()
    }
    rows = [
        (
            o.o_orderkey,
            o.o_orderpriority,
            seg[o.o_custkey],
            1 if o.o_orderstatus == "F" else 0,
        )
        for o in orders
        if o.o_custkey in seg
    ]
    train = [r for r in rows if _bucket(r[0]) < _TRAIN_PCT]
    test = [r for r in rows if _bucket(r[0]) >= _TRAIN_PCT]
    assert report.n_train == len(train)
    assert report.n_test == len(test)
    assert {r[0] for r in train}.isdisjoint({r[0] for r in test})

    # leakage-safe encoders: recompute from TRAIN rows only
    def enc_table(idx):
        cnt, pos = defaultdict(int), defaultdict(int)
        for r in train:
            cnt[r[idx]] += 1
            pos[r[idx]] += r[3]
        prior = sum(r[3] for r in train) / len(train)
        return {
            k: (pos[k] + _TE_M * prior) / (cnt[k] + _TE_M) for k in cnt
        }

    ep, es = enc_table(1), enc_table(2)
    scores = {r[0]: (ep[r[1]] + es[r[2]]) / 2.0 for r in test}
    got_scores = {r.o_orderkey: r.score for r in scored.collect()}
    assert set(got_scores) == set(scores)
    for k, s in scores.items():
        assert abs(got_scores[k] - s) < 1e-9

    # AUC replay (average-rank ties)
    import bisect

    pos_s = sorted(s for r in test for s in [scores[r[0]]] if r[3] == 1)
    neg_s = sorted(s for r in test for s in [scores[r[0]]] if r[3] == 0)
    wins = ties = 0
    for p in pos_s:
        wins += bisect.bisect_left(neg_s, p)
        ties += bisect.bisect_right(neg_s, p) - bisect.bisect_left(neg_s, p)
    auc = (wins + 0.5 * ties) / (len(pos_s) * len(neg_s))
    assert abs(report.auc - auc) < 1e-6

    # Brier replay
    brier = sum((scores[r[0]] - r[3]) ** 2 for r in test) / len(test)
    assert abs(report.brier - brier) < 1e-6

    # structural sanity
    assert 0.0 <= report.auc <= 1.0
    assert 0.0 <= report.brier <= 1.0
    assert abs(report.base_rate - len(pos_s) / len(test)) < 1e-6
    if report.threshold != -1.0:
        top = [r for r in test if scores[r[0]] >= report.threshold - 1e-9]
        assert len(top) <= len(test) / 5 + 1


def _write_eval_tables(spark, sf_dir, orders, customers):
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderpriority string, o_orderstatus string",
    ).write.parquet(f"{sf_dir}/orders.parquet")
    spark.createDataFrame(
        customers, "c_custkey long, c_mktsegment string"
    ).write.parquet(f"{sf_dir}/customer.parquet")


def test_unseen_test_category_scores_at_prior(spark, tmp_path):
    """A test row whose category never appears in train must stay in
    n_test and score at the train prior, not be dropped by the encoder
    join (ADVICE round 3)."""
    train_keys = [k for k in range(1, 400) if _bucket(k) < _TRAIN_PCT][:20]
    test_key = next(k for k in range(1, 400) if _bucket(k) >= _TRAIN_PCT)

    orders = [
        (k, 1 + (i % 2), "P1" if i % 2 else "P2", "F" if i % 3 else "O")
        for i, k in enumerate(train_keys)
    ]
    # the lone test row carries a priority AND a segment train never saw
    orders.append((test_key, 99, "RARE", "F"))
    customers = [(1, "SEGA"), (2, "SEGB"), (99, "SEGZ")]
    _write_eval_tables(spark, str(tmp_path), orders, customers)

    report, scored = model_eval(spark, str(tmp_path))
    assert report.n_test == 1
    prior = sum(1 for o in orders[:-1] if o[3] == "F") / len(train_keys)
    got = scored.collect()[0]
    assert abs(got["score"] - prior) < 1e-9
    # single-row test split is single-class: AUC guard, no ZeroDivisionError
    assert report.auc == 0.5
    assert abs(report.brier - (prior - 1) ** 2) < 1e-9
