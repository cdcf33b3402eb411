"""Wave-16 operator coherence: EMD replay for t-closeness and the
k-fold balance guarantee."""

import hashlib
from collections import Counter, defaultdict

from tests.conftest import SF_SMOKE
from waterbear_spark.queries import wave16
from waterbear_spark.queries.tables import table


def test_tcloseness_matches_emd_replay(spark):
    got = {
        (r["nation"], r["segment"]): (r["n_custs"], r["emd"], r["released"])
        for r in wave16.tcloseness_release(spark, SF_SMOKE).collect()
    }
    cust = table(spark, SF_SMOKE, "customer").collect()
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in table(spark, SF_SMOKE, "nation").collect()
    }
    import math

    cells = Counter()
    for r in cust:
        band = math.floor(r["c_acctbal"] / wave16._TC_BAND)
        cells[(nations[r["c_nationkey"]], r["c_mktsegment"], band)] += 1
    bands = sorted({b for (_, _, b) in cells})
    total = sum(cells.values())
    gcum = {}
    acc = 0
    for b in bands:
        acc += sum(c for (n, s, bb), c in cells.items() if bb == b)
        gcum[b] = acc
    groups = defaultdict(int)
    for (n, s, b), c in cells.items():
        groups[(n, s)] += c
    for (n, s), ng in groups.items():
        cum = 0
        emd = 0.0
        for b in bands:  # fold in band order, like the engine
            cum += cells.get((n, s, b), 0)
            emd += abs(cum / ng - gcum[b] / total)
        emd = round(emd / (len(bands) - 1), 6)
        assert got[(n, s)] == (ng, emd, emd <= wave16._TC_T), (n, s)
    # the gate must actually discriminate on this data
    flags = {v[2] for v in got.values()}
    assert flags == {True, False}


def test_kfold_is_balanced_and_deterministic(spark):
    rows = wave16.stratified_kfold_census(spark, SF_SMOKE).collect()
    per_lang = defaultdict(dict)
    for r in rows:
        per_lang[r["lang"]][r["fold"]] = r["n_docs"]
    for lang, folds in per_lang.items():
        assert set(folds) == set(range(wave16._KF_K)), lang
        sizes = list(folds.values())
        assert max(sizes) - min(sizes) <= 1, lang  # the stratified guarantee
    # replay: fold of each doc from the md5 rank within its stratum
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    by_lang = defaultdict(list)
    for r in docs:
        key = hashlib.md5(f"kf|{r['doc_id']}".encode()).hexdigest()
        by_lang[r["lang"]].append((key, r["doc_id"]))
    for lang, lst in by_lang.items():
        lst.sort()
        expect = Counter(i % wave16._KF_K for i in range(len(lst)))
        assert expect == Counter(
            {f: n for f, n in per_lang[lang].items() if n}
        ), lang
