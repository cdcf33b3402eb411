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


# ---------------------------------------------------------------------------
# round 9: CHECK constraints on merge + replaceWhere corner cases
# ---------------------------------------------------------------------------


def _rows(df):
    return sorted((r["id"], r["name"], r["v"]) for r in df.collect())


def test_merge_check_violation_aborts_untouched(spark, tmp_path):
    from waterbear_spark.sources.sinks import CheckViolationError

    path = _seed(spark, tmp_path)
    before = _rows(spark.read.parquet(path))
    batch = spark.createDataFrame(
        [(2, "B2", -5), (4, "d", 40)], "id bigint, name string, v bigint"
    )
    with pytest.raises(CheckViolationError, match="v_nonneg"):
        merge_upsert(
            spark,
            path,
            batch,
            keys=["id"],
            check_constraints={"v_nonneg": "v >= 0"},
        )
    # Delta transactionality: a failed CHECK leaves the table untouched —
    # including the batch's VALID rows (no partial commit)
    assert _rows(spark.read.parquet(path)) == before


def test_merge_check_passing_batch_commits(spark, tmp_path):
    path = _seed(spark, tmp_path)
    batch = spark.createDataFrame([(2, "B2", 22)], "id bigint, name string, v bigint")
    out = merge_upsert(
        spark,
        path,
        batch,
        keys=["id"],
        check_constraints={"v_nonneg": "v >= 0", "named": "name IS NOT NULL"},
    )
    assert {r["id"]: r["v"] for r in out.collect()} == {1: 10, 2: 22, 3: 30}


def test_merge_check_null_predicate_is_violation(spark, tmp_path):
    from waterbear_spark.sources.sinks import CheckViolationError

    path = _seed(spark, tmp_path)
    # v NULL -> predicate NULL -> NOT accepted (Delta requires TRUE)
    batch = spark.createDataFrame(
        [(4, "d", None)], "id bigint, name string, v bigint"
    )
    with pytest.raises(CheckViolationError, match="v_nonneg"):
        merge_upsert(
            spark, path, batch, keys=["id"], check_constraints={"v_nonneg": "v >= 0"}
        )


def test_merge_check_exempts_deletes(spark, tmp_path):
    path = _seed(spark, tmp_path)
    # the delete row carries NULL v; checks apply only to WRITTEN rows
    batch = spark.createDataFrame(
        [(3, None, None, "D"), (2, "B2", 22, "U")],
        "id bigint, name string, v bigint, _op string",
    )
    out = merge_upsert(
        spark,
        path,
        batch,
        keys=["id"],
        delete_condition="_op = 'D'",
        check_constraints={"v_nonneg": "v >= 0", "named": "name IS NOT NULL"},
    )
    assert {r["id"]: r["v"] for r in out.collect()} == {1: 10, 2: 22}


def test_replace_where_basic_region_swap(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    repl = spark.createDataFrame(
        [(2, "B2", 22), (5, "e", 50)], "id bigint, name string, v bigint"
    )
    out = replace_where(spark, path, repl, "id >= 2 AND id <= 5")
    # ids 2 and 3 (the matching region) are gone; the region's new
    # contents replace them; id 1 (outside) is untouched
    assert _rows(out) == [(1, "a", 10), (2, "B2", 22), (5, "e", 50)]


def test_replace_where_rejects_out_of_region_rows(spark, tmp_path):
    from waterbear_spark.sources.sinks import CheckViolationError, replace_where

    path = _seed(spark, tmp_path)
    before = _rows(spark.read.parquet(path))
    repl = spark.createDataFrame(
        [(2, "B2", 22), (99, "zz", 1)], "id bigint, name string, v bigint"
    )
    with pytest.raises(CheckViolationError, match="replaceWhere"):
        replace_where(spark, path, repl, "id >= 2 AND id <= 5")
    assert _rows(spark.read.parquet(path)) == before  # aborted pre-mutation

    # Delta's constraintCheck opt-out: the same write goes through and
    # the out-of-region row simply lands in the table
    out = replace_where(
        spark, path, repl, "id >= 2 AND id <= 5", check_constraint_enabled=False
    )
    assert _rows(out) == [(1, "a", 10), (2, "B2", 22), (99, "zz", 1)]


def test_replace_where_empty_frame_is_region_delete(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    empty = spark.createDataFrame([], "id bigint, name string, v bigint")
    out = replace_where(spark, path, empty, "id > 1")
    assert _rows(out) == [(1, "a", 10)]


def test_replace_where_no_match_is_pure_insert(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    repl = spark.createDataFrame([(7, "g", 70)], "id bigint, name string, v bigint")
    out = replace_where(spark, path, repl, "id = 7")
    assert _rows(out) == [(1, "a", 10), (2, "b", 20), (3, "c", 30), (7, "g", 70)]


def test_replace_where_null_predicate_rows_are_kept(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)],
        "id bigint, name string, v bigint",
    ).write.parquet(path)
    repl = spark.createDataFrame([(3, "C3", 33)], "id bigint, name string, v bigint")
    # predicate over v: NULL for id=2 -> kept (only TRUE deletes)
    out = replace_where(spark, path, repl, "v >= 30")
    assert _rows(out) == [(1, "a", 10), (2, "b", None), (3, "C3", 33)]


def test_replace_where_arbitrary_non_partition_column(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    repl = spark.createDataFrame([(9, "b", 99)], "id bigint, name string, v bigint")
    out = replace_where(spark, path, repl, "name = 'b'")
    assert _rows(out) == [(1, "a", 10), (3, "c", 30), (9, "b", 99)]


def test_replace_where_schema_mismatch_raises(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    repl = spark.createDataFrame([(2, "B2", 22, "x")], "id bigint, name string, v bigint, extra string")
    with pytest.raises(ValueError, match="does not[\\s\\S]*evolve"):
        replace_where(spark, path, repl, "id = 2")


def test_replace_where_leaves_no_debris(spark, tmp_path):
    from waterbear_spark.sources.sinks import replace_where

    path = _seed(spark, tmp_path)
    repl = spark.createDataFrame([(2, "B2", 22)], "id bigint, name string, v bigint")
    replace_where(spark, path, repl, "id = 2")
    leftovers = [
        p.name
        for p in tmp_path.iterdir()
        if "__staging" in p.name or "__old" in p.name
    ]
    assert leftovers == []
