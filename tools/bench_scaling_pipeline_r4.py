"""Round-4 re-measurement of the doc-pipeline scaling number (B4).

The r3 `doc_pipeline` efficiency (0.865 @ 2→8 cores, docs ×512) was
measured with `check_every=2` in the CC canonicalization; round 4
reverted that to per-round convergence checks (the alias graph
converges in one star round, so ce=2 ran three extra rounds — a
LARGER serial floor, not a smaller one).  This tool re-runs ONLY the
pipeline measurement on the same ×512 input (built by
tools/bench_scaling.py; reused if present), same protocol: fresh JVM
per level, un-timed warm-up, median of 5 timed runs through a noop
sink, RAM-backed spark.local.dir.

Appends to BENCH/scaling_history.jsonl; update BENCH/scaling.json by
hand from the printed summary (it is the consolidated verdict file).

Usage: python tools/bench_scaling_pipeline_r4.py [N=2]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PIPE_DIR = "/dev/shm/scale_input_pipe512"

_MEASURE = f'''
import time, sys, json, statistics
sys.path.insert(0, "{REPO}")
cpus, sp = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
  .config("spark.sql.shuffle.partitions", str(sp))
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
  .config("spark.sql.adaptive.skewJoin.enabled", "true")
  .config("spark.driver.memory", "56g")
  .config("spark.driver.extraJavaOptions", "-Xms24g -XX:+UseG1GC")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false")
  .config("spark.local.dir", "/dev/shm/spark-bench-local")
  .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ont_d2rq_spark.session import ship_package
from ont_d2rq_spark.pipeline.docs import build_kg
ship_package(spark)
def run_pipe():
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    build_kg(spark, "{PIPE_DIR}", root=None).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
n_kg = build_kg(spark, "{PIPE_DIR}", root=None).count()  # warm-up + count
walls = [run_pipe() for _ in range(5)]
med = statistics.median(walls)
print("MEASURE " + json.dumps({{"cpus": cpus, "walls": [round(w,1) for w in walls],
  "median_wall": round(med,1), "best_wall": round(min(walls),1), "kg_triples": n_kg,
  "triples_per_sec": round(n_kg/med), "best_triples_per_sec": round(n_kg/min(walls))}}))
'''


def run(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args], capture_output=True, text=True, timeout=3600
    )
    return out.stdout + out.stderr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if not Path(f"{PIPE_DIR}/documents.parquet").exists():
        raise SystemExit(
            f"{PIPE_DIR} missing — build it with tools/bench_scaling.py first"
        )
    results = {}
    for cpus in (n, 4 * n):
        subprocess.run(["sync"])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
        out = run(_MEASURE, str(cpus), "64")
        lines = [l for l in out.splitlines() if l.startswith("MEASURE ")]
        if not lines:
            print(out[-3000:])
            raise SystemExit("measurement failed")
        results[cpus] = json.loads(lines[-1][len("MEASURE "):])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
    r_n, r_4n = results[n], results[4 * n]
    eff = round((r_4n["triples_per_sec"] / r_n["triples_per_sec"]) / 4, 3)
    beff = round((r_4n["best_triples_per_sec"] / r_n["best_triples_per_sec"]) / 4, 3)
    summary = {
        "kind": "pipeline_r4_ce1",
        "n_cores": n,
        "pipe_input": PIPE_DIR,
        "eff_pipeline": eff,
        "eff_best_run": beff,
        "raw": results,
    }
    with open(REPO / "BENCH" / "scaling_history.jsonl", "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
