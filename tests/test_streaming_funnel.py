"""Streaming twin of the quality-gate funnel: a documents JSON file
stream through funnel_census (Trigger.AvailableNow, complete mode, one
stateful aggregation) must equal the batch catalog query's frame."""

import pytest

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table
from waterbear_spark.queries.wave18 import quality_gate_funnel
from waterbear_spark.streaming.funnel import funnel_census
from waterbear_spark.testing import compare_frames


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs_json"))
    (
        table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .coalesce(4)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_funnel_stream_matches_batch(spark, docs_stream_dir):
    schema = (
        table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .schema
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .json(docs_stream_dir)
    )
    query = (
        funnel_census(stream)
        .writeStream.format("memory")
        .queryName("funnel_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = spark.sql("SELECT * FROM funnel_stream_test")
    want = quality_gate_funnel(spark, SF_SMOKE)
    problems = compare_frames(
        got.columns,
        [tuple(r) for r in got.collect()],
        want.columns,
        [tuple(r) for r in want.collect()],
    )
    assert problems == []
    assert got.count() == 5


def test_funnel_census_batch_mode_equals_catalog(spark):
    # the same transform is batch-callable: one definition, two runtimes
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    got = funnel_census(docs)
    want = quality_gate_funnel(spark, SF_SMOKE)
    problems = compare_frames(
        got.columns,
        [tuple(r) for r in got.collect()],
        want.columns,
        [tuple(r) for r in want.collect()],
    )
    assert problems == []
