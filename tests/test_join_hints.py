"""Join-strategy hints must actually steer the physical plan: the same
equi-join compiles to a broadcast, sort-merge, or shuffled-hash join on
demand. At 100 TB, hinting MERGE/SHUFFLE_HASH on a dimension that AQE
would mis-broadcast (or vice versa) is a routine intervention — this
proves the control surface works."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _join(spark, hint):
    orders = table(spark, SF_SMOKE, "orders")
    cust = table(spark, SF_SMOKE, "customer").hint(hint)
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )


def test_broadcast_hint(spark):
    assert "BroadcastHashJoin" in _plan(_join(spark, "broadcast"))


def test_merge_hint_forces_sort_merge(spark):
    plan = _plan(_join(spark, "merge"))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint(spark):
    plan = _plan(_join(spark, "shuffle_hash"))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_hints_do_not_change_results(spark):
    rows = {
        hint: sorted(map(tuple, _join(spark, hint).collect()))
        for hint in ("broadcast", "merge", "shuffle_hash")
    }
    assert rows["broadcast"] == rows["merge"] == rows["shuffle_hash"]
