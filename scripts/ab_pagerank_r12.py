#!/usr/bin/env python
"""Interleaved A/B: r11 pair-form pagerank vs r12 directed-edge form.

Both variants run in ONE session, alternating A,B,A,B,... with
clearCache between reps so each rep pays full setup + 5 rounds + top-k
through the noop sink (the bench's exact measure). Interleaving is the
load-robust methodology from r11 (external host load makes sequential
wall-clock comparisons meaningless); report per-variant MIN and MEDIAN.

Usage: python scripts/ab_pagerank_r12.py [reps-per-variant]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterbear_spark.queries import graph
from waterbear_spark.queries.graph import (
    _DAMP_DEN,
    _DAMP_NUM,
    _ITERS,
    _SCALE,
    _SUPP_OFF,
)
from waterbear_spark.queries.tables import table


def _setup_pairs(spark, sf_dir):
    """The committed r11 pair-form setup (verbatim semantics)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .persist()
    )
    cdeg = pairs.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cdeg"))
    sdeg = pairs.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("sdeg"))
    pairs_deg = (
        pairs.join(F.broadcast(cdeg), "o_custkey")
        .join(F.broadcast(sdeg), "l_suppkey")
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _SUPP_OFF).alias("supp"),
            "cdeg",
            "sdeg",
        )
        .persist()
    )
    nodes = cdeg.select(F.col("o_custkey").alias("node")).unionAll(
        sdeg.select((F.col("l_suppkey") + _SUPP_OFF).alias("node"))
    ).persist()
    n_nodes = max(nodes.count(), 1)
    return pairs_deg, nodes, n_nodes


def _round_pairs(pairs_deg: DataFrame, ranks: DataFrame, base: int) -> DataFrame:
    both = (
        pairs_deg.join(
            F.broadcast(ranks.withColumnRenamed("r", "rc")),
            F.col("cust") == F.col("node"),
        )
        .drop("node")
        .join(
            F.broadcast(ranks.withColumnRenamed("r", "rs")),
            F.col("supp") == F.col("node"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("supp").alias("dst"),
                        F.expr("rc div cdeg").alias("c"),
                    ),
                    F.struct(
                        F.col("cust").alias("dst"),
                        F.expr("rs div sdeg").alias("c"),
                    ),
                )
            ).alias("e")
        )
        .select("e.dst", "e.c")
    )
    return (
        both.groupBy("dst")
        .agg(
            (F.lit(base) + F.expr(f"sum(c) * {_DAMP_NUM} div {_DAMP_DEN}")).alias("r")
        )
        .withColumnRenamed("dst", "node")
    )


def _run_pairs(spark, sf_dir):
    pairs_deg, nodes, n_nodes = _setup_pairs(spark, sf_dir)
    base = _SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN // n_nodes
    ranks = nodes.select("node", F.lit(_SCALE // n_nodes).alias("r"))
    for _ in range(_ITERS):
        ranks = _round_pairs(pairs_deg, ranks, base).localCheckpoint(eager=False)
    return (
        ranks.filter(F.col("node") >= _SUPP_OFF)
        .select(
            (F.col("node") - _SUPP_OFF).alias("supp_id"), F.col("r").alias("rank_fp")
        )
        .orderBy(F.col("rank_fp").desc(), "supp_id")
        .limit(25)
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-pagerank-r12")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    variants = {
        "pairs_r11": lambda: _run_pairs(spark, sf_dir),
        "edges_r12": lambda: graph.pagerank_bipartite(spark, sf_dir),
    }
    times = {k: [] for k in variants}
    # one untimed warmup each (codegen), then strict interleave
    for name, fn in variants.items():
        spark.catalog.clearCache()
        fn().write.mode("overwrite").format("noop").save()
    for _ in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    out = {
        name: {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "all": ts,
        }
        for name, ts in times.items()
    }
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
