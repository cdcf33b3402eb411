"""dup_span_removal_manifest: planted-duplicate tests for the
cross-document duplicated-span keep/cut manifest (round 8)."""

import pytest
from pyspark.sql import functions as F

from waterbear_spark.queries.wave25 import _MANIFEST_K, _removal_manifest

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_cross_doc_span_cut_from_later_doc_only(spark):
    k = _MANIFEST_K
    shared = _words("dup", k + 2)  # a (k+2)-token span -> 3 windows
    d0 = _words("a", 5) + " " + shared + " " + _words("b", 5)
    d1 = _words("c", 7) + " " + shared + " " + _words("e", 4)
    got = _removal_manifest(_docs(spark, [d0, d1])).collect()
    # doc 0 is the keeper: nothing cut from it; doc 1 cuts exactly the
    # shared span, merged into ONE island at 1-based positions 8..8+k+1
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == 1
    assert r["cut_start"] == 8
    assert r["cut_end"] == 8 + (k + 2) - 1
    assert r["cut_tokens"] == k + 2


def test_three_copies_keep_first_cut_rest(spark):
    k = _MANIFEST_K
    shared = _words("dup", k)  # exactly one window per copy
    texts = [
        shared + " " + _words("x", 3),
        _words("y", 4) + " " + shared,
        shared + " " + _words("z", 2),
    ]
    got = {r["doc_id"]: r for r in _removal_manifest(_docs(spark, texts)).collect()}
    assert set(got) == {1, 2}  # doc 0 keeps; docs 1 and 2 cut
    assert (got[1]["cut_start"], got[1]["cut_end"]) == (5, 5 + k - 1)
    assert (got[2]["cut_start"], got[2]["cut_end"]) == (1, k)


def test_adjacent_islands_merge_and_disjoint_stay_split(spark):
    k = _MANIFEST_K
    s1 = _words("p", k)
    s2 = _words("q", k)
    keeper = s1 + " " + _words("f", 8) + " " + s2
    # victim holds both spans separated by a >1-token unique gap, so the
    # manifest must emit TWO islands
    victim = s1 + " " + _words("g", 5) + " " + s2
    got = _removal_manifest(_docs(spark, [keeper, victim])).collect()
    assert [(r["cut_start"], r["cut_end"]) for r in got if r["doc_id"] == 1] == [
        (1, k),
        (k + 6, 2 * k + 5),
    ]
    # victim2 holds the spans back-to-back: one merged island
    victim2 = s1 + " " + s2
    got2 = _removal_manifest(_docs(spark, [keeper, victim2])).collect()
    assert [(r["cut_start"], r["cut_end"]) for r in got2 if r["doc_id"] == 1] == [
        (1, 2 * k)
    ]


def test_within_doc_repeat_alone_is_not_cut(spark):
    k = _MANIFEST_K
    rep = _words("r", k)
    # the span repeats INSIDE one document but exists nowhere else:
    # cross-doc dedup leaves it alone
    texts = [rep + " " + _words("m", 4) + " " + rep, _words("n", k + 5)]
    assert _removal_manifest(_docs(spark, texts)).count() == 0


def test_short_docs_are_skipped(spark):
    texts = [_words("s", _MANIFEST_K - 1), _words("s", _MANIFEST_K - 1)]
    # identical but sub-window-length documents produce no windows at all
    assert _removal_manifest(_docs(spark, texts)).count() == 0


def test_rewrite_splices_out_planted_span(spark, tmp_path):
    from waterbear_spark.queries.wave25 import dup_span_rewrite

    k = _MANIFEST_K
    shared = _words("dup", k)
    pre, post = _words("c", 4), _words("e", 3)
    d0 = _words("a", 3) + " " + shared  # keeper
    d1 = pre + " " + shared + " " + post  # victim
    sf = tmp_path / "sf"
    sf.mkdir()
    _docs(spark, [d0, d1]).withColumn("text", F.col("text")).write.parquet(
        str(sf / "documents.parquet")
    )
    got = dup_span_rewrite(spark, str(sf)).collect()
    # only the victim is affected; its text is the planted span spliced out
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == 1
    assert r["n_before"] == 4 + k + 3
    assert r["n_after"] == 7
    assert r["text_after"] == pre + " " + post
