"""MERGE-semantics contract suite for the parquet staged-swap fallback
(round 8 — the r7 verdict's Delta item): delta-spark is absent from this
environment, so the fallback path is what users actually run here; these
tests pin it to Delta MERGE's corner-case behavior so swapping fmt:
parquet -> delta never changes answers.
"""

import pytest
from pyspark.sql import functions as F

from waterbear_spark.sources.sinks import merge_upsert

pytestmark = pytest.mark.usefixtures("spark")


def _seed(spark, tmp_path, rows=None):
    path = str(tmp_path / "tbl")
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    spark.createDataFrame(rows, "id bigint, name string, v bigint").write.parquet(
        path
    )
    return path


def test_update_insert_delete_one_batch(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame(
        [
            (2, "B2", 22, "U"),  # update
            (4, "d", 40, "U"),  # insert
            (3, None, None, "D"),  # delete
        ],
        "id bigint, name string, v bigint, _op string",
    )
    out = merge_upsert(
        spark, path, batch, keys=["id"], delete_condition="_op = 'D'"
    )
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("B2", 22), 4: ("d", 40)}
    # the CDC flag column never lands in the table
    assert "_op" not in out.columns


def test_delete_of_absent_key_is_noop(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame(
        [(99, None, None, "D")], "id bigint, name string, v bigint, _op string"
    )
    out = merge_upsert(
        spark, path, batch, keys=["id"], delete_condition="_op = 'D'"
    )
    assert out.count() == 3


def test_duplicate_batch_keys_raise_like_delta(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], "id bigint, name string, v bigint"
    )
    # Delta MERGE errors when one target row matches several source rows;
    # the naive fallback would silently insert both copies
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, path, batch, keys=["id"])


def test_schema_evolution_requires_opt_in(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame(
        [(2, "B2", 22, "eu")], "id bigint, name string, v bigint, region string"
    )
    with pytest.raises(ValueError, match="adds columns"):
        merge_upsert(spark, path, batch, keys=["id"])
    out = merge_upsert(spark, path, batch, keys=["id"], merge_schema=True)
    got = {r["id"]: r["region"] for r in out.collect()}
    # old rows read NULL for the evolved column (Delta mergeSchema)
    assert got == {1: None, 2: "eu", 3: None}


def test_composite_keys(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20), (2, "x", 30)],
        "k1 bigint, k2 string, v bigint",
    ).write.parquet(path)
    batch = spark.createDataFrame(
        [(1, "y", 99), (2, "z", 7)], "k1 bigint, k2 string, v bigint"
    )
    out = merge_upsert(spark, path, batch, keys=["k1", "k2"])
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == {(1, "x"): 10, (1, "y"): 99, (2, "x"): 30, (2, "z"): 7}


def test_null_delete_condition_keeps_row_as_upsert(spark, tmp_path):
    path = _seed(spark, tmp_path)
    # _op NULL -> predicate NULL -> NOT a delete (SQL three-valued logic:
    # only TRUE deletes), the row upserts normally
    batch = spark.createDataFrame(
        [(2, "B2", 22, None)], "id bigint, name string, v bigint, _op string"
    )
    out = merge_upsert(
        spark, path, batch, keys=["id"], delete_condition="_op = 'D'"
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 10, 2: 22, 3: 30}


def test_staged_swap_leaves_no_debris(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame([(1, "A", 11)], "id bigint, name string, v bigint")
    merge_upsert(spark, path, batch, keys=["id"])
    leftovers = [
        p.name
        for p in tmp_path.iterdir()
        if "__staging" in p.name or "__old" in p.name
    ]
    assert leftovers == []
