"""Wave-18 coherence: python replays of the funnel attrition, the
budget/cap/redistribution invariants, and the quantization error."""

import math
from collections import Counter

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave18
from waterbear_spark.queries.tables import table


def _toks(text):
    return [t for t in text.lower().split() if t]


def test_funnel_matches_python_replay(spark):
    docs = table(spark, SF_SMOKE, "documents").collect()
    surv = [0] * 6
    for r in docs:
        toks = _toks(r["text"])
        cnt = len(toks)
        sumlen = sum(len(t) for t in toks)
        stop = sum(t in wave18._STOPWORDS for t in toks)
        topcnt = max(Counter(toks).values()) if toks else 0
        gates = [
            r["n_chars"] >= wave18._MIN_CHARS,
            3 * cnt <= sumlen <= 12 * cnt,
            20 * stop >= cnt,
            5 * topcnt <= cnt,
            r["lang"] in wave18._LANG_OK,
        ]
        surv[0] += 1
        ok = True
        for i, g in enumerate(gates):
            ok = ok and g
            surv[i + 1] += ok
    got = wave18.quality_gate_funnel(spark, SF_SMOKE).collect()
    assert [(r["n_in"], r["n_out"]) for r in got] == [
        (surv[i], surv[i + 1]) for i in range(5)
    ]
    assert all(r["n_fail"] == r["n_in"] - r["n_out"] for r in got)
    # the funnel must discriminate: some gate fails someone, some doc survives
    assert got[-1]["n_out"] > 0 and any(r["n_fail"] > 0 for r in got)


def test_epoch_allocation_invariants(spark):
    rows = wave18.epoch_allocation(spark, SF_SMOKE).collect()
    tot_avail = sum(r["avail"] for r in rows)
    budget = tot_avail * wave18._EA_BUDGET_NUM // wave18._EA_BUDGET_DEN
    allocated = sum(r["allocated"] for r in rows)
    # never exceeds the budget; within |sources| floor-loss of it unless
    # everything is capped
    assert allocated <= budget
    if not all(r["capped"] for r in rows):
        assert budget - allocated <= 2 * len(rows)
    for r in rows:
        assert 0 <= r["epochs"] <= wave18._EA_MAX_EPOCHS + 1e-9
        if r["capped"]:
            assert r["allocated"] == r["avail"] * wave18._EA_MAX_EPOCHS
    # exact python replay of the closed form
    w = {r["source"]: round(math.sqrt(r["avail"]) * wave18._EA_WSCALE) for r in rows}
    W = sum(w.values())
    desired = {s: budget * w[s] // W for s in w}
    avail = {r["source"]: r["avail"] for r in rows}
    alloc1 = {s: min(desired[s], avail[s] * wave18._EA_MAX_EPOCHS) for s in w}
    leftover = sum(desired.values()) - sum(alloc1.values())
    w_free = sum(w[s] for s in w if desired[s] <= avail[s] * wave18._EA_MAX_EPOCHS)
    for r in rows:
        s = r["source"]
        extra = (
            leftover * w[s] // w_free
            if desired[s] <= avail[s] * wave18._EA_MAX_EPOCHS and w_free > 0
            else 0
        )
        assert r["allocated"] == alloc1[s] + extra, s


def test_quantization_audit_matches_numpy(spark):
    import numpy as np

    emb = table(spark, SF_SMOKE, "embeddings").collect()
    mat = np.asarray([list(r["embedding"]) for r in emb], dtype=np.float64)
    labels = np.asarray([r["label"] for r in emb])
    mx = np.abs(mat).max(axis=0)
    live = mx > 0
    q = np.clip(np.floor(mat[:, live] * 127.0 / mx[live] + 0.5), -127, 127)
    err = np.abs(mat[:, live] - q * mx[live] / 127.0)
    err_fp = np.round(err * wave18._Q_ERRSCALE)
    got = {r["label"]: r for r in
           wave18.embedding_quantization_audit(spark, SF_SMOKE).collect()}
    for lab in np.unique(labels):
        e = err_fp[labels == lab].ravel()
        r = got[int(lab)]
        assert r["n_components"] == e.size
        assert abs(r["mean_abs_err"]
                   - round(e.sum() / e.size / wave18._Q_ERRSCALE, 9)) < 1e-12
        assert abs(r["max_abs_err"]
                   - round(e.max() / wave18._Q_ERRSCALE, 9)) < 1e-12
        # int8 on unit-ish vectors should be sub-1% mean error
        assert r["mean_abs_err"] < 0.01
