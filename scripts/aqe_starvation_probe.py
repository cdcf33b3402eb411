#!/usr/bin/env python
"""Stage-level AQE-coalesce starvation probe (r11).

The r10 lesson: AQE coalesces shuffle partitions by BYTES, so a stage
whose cost is FLOPs-or-CPU-per-byte-heavy (matmul, levenshtein verify,
per-token hashing) can be packed into a handful of tasks and starve a
32-core cluster while its exchange input is only a few MB. The r10 pass
pinned the four per-bucket BLAS matmul stages and the
sorted-neighborhood verify; this probe applies the same diagnostic to
the remaining compute-heavy catalog rows the r10 verdict listed.

For each target query it runs the plan at the given scale and reads the
completed-stage metrics from the Spark UI REST API, then reports every
stage alongside ``tasks vs cores`` and the share of total executor CPU
it consumed. The starvation signal is a stage that (a) burns a
meaningful share of the query's executor time, and (b) ran on fewer
than half the cores. Stages that are scan-width-bound (file splits) are
expected and annotated by their name.

Prints one JSON line; committed as AQE_PROBE_r{N}.json.

Usage: python scripts/aqe_starvation_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DEFAULT = os.path.join(REPO, "localdata", "sf1")

# executor-time share below which a narrow stage is noise, not a finding
SHARE_BAR = 0.15


def targets():
    from waterbear_spark.queries import mining, textops, wave3, wave13, wave15

    return {
        "er_golden_records": mining.er_golden_records,
        "fuzzy_join_parts": textops.fuzzy_join_parts,
        "typo_dedup_vocab": wave13.typo_dedup_vocab,
        "winnowing_fingerprints": wave3.winnowing_fingerprints,
        "dedup_cross_modal": wave15.dedup_cross_modal,
    }


def stage_map(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {s["stageId"]: s for s in json.load(r)}


def calibrate(spark, cpus: int) -> tuple[dict[int, float], int]:
    """Measured parallelism-saturation curve of THIS box: wall time of a
    fixed CPU-bound job (md5 chain) at increasing task counts. local[32]
    does not mean 32 effective cores — the knee of this curve is the
    task width beyond which extra tasks buy nothing, and it is the
    honest bar for calling a narrow stage 'starved'."""
    from pyspark.sql import functions as F

    curve = {}
    for parts in (1, 2, 4, 8, 16, 32):
        if parts > cpus:
            break
        df = spark.range(1_600_000).repartition(parts).select(
            F.md5(F.md5(F.md5(F.col("id").cast("string")))).alias("h")
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        curve[parts] = round(best, 3)
    best_t = min(curve.values())
    knee = min(p for p, t in curve.items() if t <= 1.2 * best_t)
    return curve, knee


def _widen(spark, df):
    """Probe-arm scan widener: repartition a file-backed frame to
    cluster width when its split count is in the starvable band (>=4
    files so we never blow up broadcast-sized dims, < cores)."""
    try:
        n = len(df.inputFiles())
    except Exception:
        return df
    target = spark.sparkContext.defaultParallelism
    if 4 <= n < target:
        return df.repartition(target)
    return df


def ab_fanout(spark, name, fn, sf_dir, modules) -> dict:
    """Warm min-of-3 wall for the query as-is vs with every starvable
    scan widened (per-module ``table`` monkeypatch). The decisive test
    for a flagged stage: if widening buys nothing, the narrow scan
    already saturates this box and no pin is warranted."""
    import waterbear_spark.queries.tables as tables_mod

    def measure():
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    base = measure()
    orig = tables_mod.table

    def widened_table(spark_, sf_dir_, tname):
        return _widen(spark_, orig(spark_, sf_dir_, tname))

    patched = []
    for mod in modules:
        if getattr(mod, "table", None) is orig:
            mod.table = widened_table
            patched.append(mod)
    try:
        wide = measure()
    finally:
        for mod in patched:
            mod.table = orig
    speedup = round(base / wide, 2) if wide else None
    return {
        "base_sec": base,
        "widened_sec": wide,
        "speedup": speedup,
        "verdict": "pin scan width" if speedup and speedup >= 1.1 else
                   "saturated - no pin",
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DEFAULT
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aqe-starvation-probe")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4059")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    curve, knee = calibrate(spark, cpus)

    report = {}
    for name, fn in targets().items():
        spark.catalog.clearCache()
        before = set(stage_map(ui, app_id))
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 2)
        time.sleep(0.5)  # let the UI store flush the last stage
        after = stage_map(ui, app_id)
        new = [s for sid, s in sorted(after.items()) if sid not in before]
        total_run = sum(s.get("executorRunTime", 0) for s in new) or 1
        stages = []
        flagged = []
        for s in new:
            tasks = s.get("numCompleteTasks", 0)
            share = s.get("executorRunTime", 0) / total_run
            row = {
                "stage": s["stageId"],
                "tasks": tasks,
                "run_ms": s.get("executorRunTime", 0),
                "share": round(share, 3),
                "name": (s.get("name") or "")[:60],
            }
            stages.append(row)
            if share >= SHARE_BAR and 0 < tasks < knee:
                flagged.append(row)
        narrow = [
            s for s in stages
            if s["share"] >= SHARE_BAR and knee <= s["tasks"] < cpus
            and s not in flagged
        ]
        entry = {
            "wall_sec_cold": wall,
            "n_stages": len(new),
            "stages": stages,
            "starved": flagged,
            "narrow_but_saturated": narrow,
        }
        if flagged or narrow:
            # the knee sits in the curve's noise band exactly where the
            # 10-split scans land, so the A/B measurement — not the
            # threshold — is the verdict for every narrow dominant stage
            from waterbear_spark.queries import (
                mining, textops, wave3, wave13, wave15,
            )

            entry["fanout_ab"] = ab_fanout(
                spark, name, fn, sf_dir,
                [mining, textops, wave3, wave13, wave15],
            )
        report[name] = entry

    out = {
        "metric": "aqe_starvation_probe",
        "sf_dir": sf_dir,
        "cores": cpus,
        "share_bar": SHARE_BAR,
        "saturation_curve_md5_tasks_to_sec": curve,
        "effective_parallelism_knee": knee,
        "rule": (
            "a stage is STARVED when it burns >= share_bar of the query's "
            "executor time on fewer tasks than the measured saturation "
            "knee (the byte-based AQE coalesce packing a CPU-dense "
            "exchange into 1-4 tasks — the r10 matmul trap). A stage at "
            "or above the knee but under local[cores] is recorded as "
            "narrow_but_saturated: typically a 10-file-split scan that "
            "already saturates this box's effective CPU throughput — "
            "widening it is measurably free of benefit here (A/B'd via "
            "repartition on rake_keywords and typo_dedup_vocab: delta 0), "
            "and at production scale such scans have thousands of splits. "
            "wall_sec_cold is a single cold run (codegen included); the "
            "executor-time shares are the signal, not the wall."
        ),
        "queries": report,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
