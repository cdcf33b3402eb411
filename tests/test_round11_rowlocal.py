"""Round-11 row-local rewrites: edge-case pins for the new internals.

The optimization round replaced shuffle formulations with row-local
array folds/enumerations in three operator families:

* ``gopher_repetition_filters`` — per-doc duplicated-n-gram chars via a
  sorted-run fold instead of an exploded (doc, n, gram) count;
* the basket trio (``itemset_pair_lift``, ``frequent_triples``,
  ``copurchase_projection``) — per-basket pair/triple unnesting instead
  of self equi-joins;
* ``bipartite_check`` — packed-edge BFS + one conflict fold instead of
  per-round broadcast joins (value-pinned by
  ``test_bipartite_matches_python_coloring``).

The existing python-replay tests certify the operators on the smoke
corpus; these tests pin the EDGE CASES a natural corpus may not contain:
documents shorter than the gram width, runs of length 1/2/3+, a source
whose total3 is zero (NULL ratio), baskets of size 1/2, and duplicate
input lines that must not double-count.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import SparkSession

from waterbear_spark.queries import wave19


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round11-rowlocal-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _stage_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _dup(toks, n):
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(grams)
    total = sum(c * len(g) for g, c in cnt.items())
    dup = sum(c * len(g) for g, c in cnt.items() if c >= 2)
    return dup, total


def test_gopher_fold_handles_short_docs_and_runs(spark, tmp_path):
    rows = [
        ("solo", "short"),  # 1 token: no 2-gram, no 3-gram (guard path)
        ("pair pair", "short"),  # one 2-gram, run of length 1; no 3-gram
        ("anchor words here now", "short"),  # keeps the source's total3 > 0
        ("a b a b a b", "runs"),  # 2-gram runs of length 3 and 2
        ("x x x x", "runs"),  # identical tokens: every gram duplicated
        ("uniq one two three four", "runs"),  # no duplication at all
    ]
    sf = _stage_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r
        for r in wave19.gopher_repetition_filters(spark, sf).collect()
    }

    agg = {}
    for t, src in rows:
        toks = t.split()
        d2, t2 = _dup(toks, 2)
        d3, t3 = _dup(toks, 3)
        n2, den2 = wave19._DUP2_THRESH
        n3, den3 = wave19._DUP3_THRESH
        a = agg.setdefault(src, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += d2 * den2 > t2 * n2 or d3 * den3 > t3 * n3
        a[2] += d2
        a[3] += t2
        a[4] += d3
        a[5] += t3
    assert set(got) == set(agg)
    for src, (n_docs, n_flagged, d2, t2, d3, t3) in agg.items():
        r = got[src]
        assert r["n_docs"] == n_docs
        assert r["n_flagged"] == n_flagged
        assert r["dup2_frac"] == round(d2 / t2, 4)
        assert r["dup3_frac"] == round(d3 / t3, 4)
    # the guard path really was exercised: the two short docs add zero
    # 3-gram chars, so "short"'s total3 equals its one long doc's alone
    assert agg["short"][5] == sum(
        len(" ".join(["anchor", "words", "here", "now"][i : i + 3]))
        for i in range(2)
    )


def _stage_lineitem(spark, tmp_path, lines):
    df = spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long, l_suppkey long"
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_basket_enumeration_matches_combinations(spark, tmp_path):
    from waterbear_spark.queries.mining import itemset_pair_lift
    from waterbear_spark.queries.wave8 import frequent_triples
    from waterbear_spark.queries.wave12 import copurchase_projection

    # baskets of size 1, 2, 3, 4 — including a DUPLICATE line (order 4
    # lists part 40 / supplier 400 twice) that the distinct-basket
    # contract must not double-count, and unsorted insert order the
    # array sort must fix
    lines = [
        (1, 10, 100),
        (2, 21, 201), (2, 20, 200),
        (3, 32, 302), (3, 30, 300), (3, 31, 301),
        (4, 43, 403), (4, 40, 400), (4, 41, 401), (4, 42, 402), (4, 40, 400),
    ]
    sf = _stage_lineitem(spark, tmp_path, lines)

    baskets = {}
    for ok, pk, _ in lines:
        baskets.setdefault(ok, set()).add(pk)
    pair_cnt = Counter()
    triple_cnt = Counter()
    for items in baskets.values():
        for p in combinations(sorted(items), 2):
            pair_cnt[p] += 1
        for t in combinations(sorted(items), 3):
            triple_cnt[t] += 1

    got_pairs = {
        (r["pa"], r["pb"]): r for r in itemset_pair_lift(spark, sf).collect()
    }
    assert set(got_pairs) == set(pair_cnt)
    for p, r in got_pairs.items():
        assert r["n_pair"] == pair_cnt[p]
        assert r["pa"] < r["pb"]
    # supports count distinct orders per item (duplicate line not double)
    assert got_pairs[(40, 41)]["n_a"] == 1

    got_triples = {
        (r["pa"], r["pb"], r["pc"]): r["n_orders"]
        for r in frequent_triples(spark, sf).collect()
    }
    assert got_triples == dict(triple_cnt)

    supp = {}
    for ok, _, sk in lines:
        supp.setdefault(ok, set()).add(sk)
    co_cnt = Counter()
    for items in supp.values():
        for p in combinations(sorted(items), 2):
            co_cnt[p] += 1
    got_co = {
        (r["s1"], r["s2"]): r["n_orders"]
        for r in copurchase_projection(spark, sf).collect()
    }
    assert got_co == dict(co_cnt)
