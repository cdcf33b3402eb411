from waterbear_spark.conf import recommended_conf


def test_recommended_conf_scales_partitions():
    small = recommended_conf(input_tb=0.001, total_cores=32)
    big = recommended_conf(input_tb=100.0, total_cores=1000)
    assert int(small["spark.sql.shuffle.partitions"]) == 64  # 2x cores floor
    # 100 TB / 192 MB target ≈ 546k partitions
    assert int(big["spark.sql.shuffle.partitions"]) > 500_000
    for conf in (small, big):
        assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"
        assert conf["spark.sql.session.timeZone"] == "UTC"


def test_recommended_conf_applies(spark):
    # every key must be a valid, settable-or-static Spark conf name: apply
    # the dynamic ones to a live session without error
    conf = recommended_conf()
    static = {"spark.sql.warehouse.dir"}
    for key, value in conf.items():
        if key in static:
            continue
        spark.conf.set(key, value)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.shuffle.partitions")
    spark.conf.unset("spark.sql.files.maxPartitionBytes")