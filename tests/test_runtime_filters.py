"""Runtime bloom-filter join pruning: with a selective build side, Spark
injects `might_contain(...)` on the probe side of a shuffle join so the
fact scan discards non-joining rows before the exchange. At 100 TB this
prunes the shuffle to the joining fraction; `conf.recommended_conf`
enables it. The size thresholds are lowered here because the test data is
tiny — on a real cluster the defaults (10 MB build / 10 GB probe) gate it
to the joins that deserve it."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table


def test_bloom_filter_prunes_shuffle_join_probe(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast would bypass the bloom filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        li = table(spark, SF_SMOKE, "lineitem")
        orders = table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # and the result is still correct vs the un-filtered plan
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        expected = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
