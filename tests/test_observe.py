"""Observation API: pipeline metrics collected inline with the action —
no second scan, no accumulator races. The pattern for production row-count
/ quality-rate telemetry at 100 TB (a .count() after the write would
re-run the whole job)."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterbear_spark.queries.tables import table


def test_observe_collects_metrics_in_one_pass(spark):
    obs = Observation("quality_metrics")
    li = table(spark, SF_SMOKE, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_discounted"),
        F.max("l_quantity").alias("max_qty"),
    )
    # one action drives both the result and the metrics
    result = observed.filter(F.col("l_returnflag") == "R").count()
    metrics = obs.get
    assert metrics["n_rows"] == li.count()
    assert 0 < metrics["n_discounted"] < metrics["n_rows"]
    assert metrics["max_qty"] == li.agg(F.max("l_quantity")).first()[0]
    assert result > 0
