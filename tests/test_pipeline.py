"""End-to-end training-corpus pipeline: quality gate -> exact dedup ->
near-dup cluster canonicals -> decontamination -> deterministic split ->
partitioned write. Stage counts must be coherent and the output corpus
must satisfy every gate it passed through."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.pipeline import training_corpus
from waterbear_spark.queries.llm import dedup_clusters, decontaminate_overlap


def test_training_corpus_pipeline(spark, tmp_path):
    out = str(tmp_path / "corpus")
    final, stats = training_corpus(spark, SF_SMOKE, out_path=out)

    # monotone survivor funnel
    assert (
        stats.n_raw
        >= stats.n_quality
        >= stats.n_exact_kept
        >= stats.n_near_kept
        >= stats.n_clean
        >= stats.n_lm_kept
        > 0
    )
    # splits partition the final corpus
    assert sum(stats.splits.values()) == stats.n_lm_kept
    assert set(stats.splits) <= {"train", "validation", "test"}
    # hash split should be roughly 80/10/10
    assert stats.splits["train"] > stats.splits.get("test", 0)

    # no duplicate texts survive
    n_distinct_text = final.select(F.md5("text")).distinct().count()
    assert n_distinct_text == stats.n_lm_kept

    # no non-canonical near-dup cluster member survives
    dropped = dedup_clusters(spark, SF_SMOKE).filter(~F.col("is_canonical"))
    assert final.join(dropped, "doc_id", "left_semi").count() == 0

    # no contaminated doc survives
    contaminated = decontaminate_overlap(spark, SF_SMOKE).filter(
        F.col("contamination") >= 0.5
    )
    assert final.join(contaminated, "doc_id", "left_semi").count() == 0

    # partitioned layout + round-trip
    assert sorted(
        p.split("=")[1] for p in os.listdir(out) if p.startswith("split=")
    ) == sorted(stats.splits)
    back = spark.read.parquet(out)
    assert back.count() == stats.n_lm_kept
    # the packing manifest covers the train split: at least one context
    # window per ~budget tokens, and zero only for an empty train split
    assert stats.n_train_sequences >= (1 if stats.splits.get("train") else 0)
    # split reads prune partitions
    train = spark.read.parquet(out).filter(F.col("split") == "train")
    assert train.count() == stats.splits["train"]
