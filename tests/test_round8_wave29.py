"""Wave-29 invariants (round 8): refine recall must dominate ADC-only
recall whenever the truth item sits in the shortlist, and anisotropy
must match a pure-Python replay of the adjacent-pair estimator."""

import math

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.wave20 import _ADC_TOPK, _SWEEP_K
from waterbear_spark.queries.wave29 import (
    _ANISO_FP,
    ann_refine_recall,
    embedding_anisotropy_audit,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_refine_recall_shape_and_dominance(spark):
    rows = ann_refine_recall(spark, SF_SMOKE).collect()
    assert len(rows) == _SWEEP_K
    for r in rows:
        assert 0 <= r["adc_hits"] <= _ADC_TOPK
        assert 0 <= r["refine_hits"] <= _ADC_TOPK
        assert abs(r["adc_recall"] - r["adc_hits"] / _ADC_TOPK) < 1e-9
        assert abs(r["refine_recall"] - r["refine_hits"] / _ADC_TOPK) < 1e-9
    # the refine stage re-ranks a strict SUPERSET of the ADC top-k by the
    # truth metric itself, so summed over probes it cannot lose recall
    assert sum(r["refine_hits"] for r in rows) >= sum(
        r["adc_hits"] for r in rows
    )


def test_anisotropy_matches_python_replay(spark):
    emb = {
        (r["label"], r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    by_label = {}
    for (label, vec_id), v in sorted(emb.items()):
        by_label.setdefault(label, []).append(v)
    want = {}
    for label, vecs in by_label.items():
        fps = []
        for a, b in zip(vecs, vecs[1:]):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            fps.append(math.floor(dot / (na * nb) * _ANISO_FP + 0.5))
        if fps:
            want[label] = (len(fps), round(sum(fps) / (len(fps) * _ANISO_FP), 6))
    got = {
        r["label"]: (r["n_pairs"], r["avg_cos"])
        for r in embedding_anisotropy_audit(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for label, (n, avg) in want.items():
        assert got[label][0] == n
        assert abs(got[label][1] - avg) < 1e-9
