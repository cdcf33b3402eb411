#!/usr/bin/env python
"""Staged-index vs rebuild-per-query bench (verdict r8 ask #5).

The r8 bench showed the ANN query trio (ann_ivfpq_adc_search,
ann_refine_rerank, ann_refine_recall) at 6.7-7.3 s each at sf0.1 — the
wall dominated by the IVF+PQ build every fresh session pays inside the
first query. Round 9 stages the index as a table
(``sources/ann_index.py``); this script measures what that buys:

* ``build_included`` — a fresh session with ``SPARK_GRAFT_ANN_REBUILD=1``
  (the certification twin: from-scratch build inside the query);
* ``staged`` — a fresh session reading the staged components, first
  call (pays the parquet load) and repeat call (the steady-state
  query path a serving deployment sees).

Each mode runs in its own subprocess so session memos can't leak
between modes. Prints one JSON line; committed as
ANN_STAGE_BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from waterbear_spark.queries import wave20, wave26, wave29
spark = (SparkSession.builder.master("local[%(cpus)s]")
    .config("spark.sql.shuffle.partitions", "%(cpus)s")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name, fn in [("ann_ivfpq_adc_search", wave20.ann_ivfpq_adc_search),
                 ("ann_refine_rerank", wave26.ann_refine_rerank),
                 ("ann_refine_recall", wave29.ann_refine_recall)]:
    t0 = time.time(); fn(spark, %(sf)r).collect()
    first = round(time.time() - t0, 3)
    t0 = time.time(); fn(spark, %(sf)r).collect()
    out[name] = {"first_s": first, "repeat_s": round(time.time() - t0, 3)}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_mode(rebuild: bool) -> dict:
    env = dict(os.environ)
    if rebuild:
        env["SPARK_GRAFT_ANN_REBUILD"] = "1"
    else:
        env.pop("SPARK_GRAFT_ANN_REBUILD", None)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    code = _WORKER % {"repo": REPO, "sf": SF, "cpus": cpus}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise SystemExit(f"worker failed:\n{proc.stdout}\n{proc.stderr}")


def main():
    # warm stage: ensure the staged components exist before the staged run
    staged_warmup = run_mode(rebuild=False)  # may build+stage on first ever run
    staged = run_mode(rebuild=False)
    build = run_mode(rebuild=True)
    out = {
        "metric": "ann_staged_index_bench",
        "sf_dir": SF,
        "build_included": build,
        "staged": staged,
        "staged_warmup_run": staged_warmup,
        "note": (
            "build_included = SPARK_GRAFT_ANN_REBUILD=1 fresh session "
            "(certification twin); staged = fresh session over the "
            "staged parquet index; repeat_s = steady-state query path"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
