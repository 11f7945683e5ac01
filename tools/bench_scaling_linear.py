"""Scaling evidence in the box's LINEAR region (BASELINE.md B4).

The 8→32 pair on this single VM is capped at ~0.66 efficiency by the
box itself (32 parallel fixed-work processes run ~1.5× slower per task
than 1 — one memory bus, shared LLC), so an engine that scales
perfectly still reads ≤0.66 there.  2→8 cores sits in the measured
linear region of the machine, so it isolates ENGINE scaling (barriers,
serial stages, skew) from hardware saturation — the regime a real
N → 4N executor cluster is in.

Same protocol and SAME ×k inflated /dev/shm input as
tools/bench_scaling.py (fresh JVM per level, un-timed warm-up, median
of 5 timed runs, fresh plan instance per run, noop sink, RAM-backed
spark.local.dir).  Measures the reference-semantics dump and the doc
pipeline; the global-distinct dump is omitted here because it already
clears the gate at 8→32 (superlinear: the 8-core level is memory-
pressured by the 24 GB shuffle).

Usage: python tools/bench_scaling_linear.py [N=2] [runs=5] [pipe_k=256]
pipe_k > 256 builds a larger ×pipe_k documents input (amortizes the
pipeline's constant CC-round barrier floor — the serial fraction that
dominates once per-stage compute shrinks below it).
Writes BENCH/scaling_linear.json; bench_scaling.py's BASELINE.md is
then hand-extended with this table.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCALE_DIR = "/dev/shm/scale_input"
PIPE_DIR = "/dev/shm/scale_input_pipe"
SRC = "/root/testdata/sf0.1"

_PREP_PIPE = '''
import sys, functools
sys.path.insert(0, "{repo}")
from ont_d2rq_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", shuffle_partitions=32)
k = int(sys.argv[1])
df = spark.read.parquet("{src}/documents.parquet")
frames = []
for i in range(k):
    frames.append(df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)))
out = functools.reduce(lambda a, b: a.unionByName(b), frames)
out.repartition(128).write.mode("overwrite").parquet("{pipe_dir}/documents.parquet")
spark.read.parquet("{src}/customer.parquet").write.mode("overwrite").parquet(
    "{pipe_dir}/customer.parquet")
print("PREP_DONE")
'''

_MEASURE = f'''
import time, sys, json, statistics
sys.path.insert(0, "{REPO}")
cpus, sp, runs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
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
from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph

def fresh():
    g = VirtualGraph(tpch_mapping("{SCALE_DIR}"), spark)
    return g.triples(fuse=True, distinct="auto")

def run_once():
    t0 = time.perf_counter()
    fresh().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

n = fresh().count()
run_once()  # warm-up, un-timed
res = {{"cpus": cpus, "sp": sp, "triples": n}}
walls = [run_once() for _ in range(runs)]
med = statistics.median(walls)
res["auto"] = {{"walls": [round(w, 1) for w in walls],
               "median_wall": round(med, 1),
               "best_wall": round(min(walls), 1),
               "triples_per_sec": round(n / med),
               "best_triples_per_sec": round(n / min(walls))}}

from ont_d2rq_spark.session import ship_package
from ont_d2rq_spark.pipeline.docs import build_kg
ship_package(spark)
def run_pipe():
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    build_kg(spark, "{PIPE_DIR}", root=None).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
n_kg = build_kg(spark, "{PIPE_DIR}", root=None).count()  # warm-up + count
pipe_walls = [run_pipe() for _ in range(runs)]
pmed = statistics.median(pipe_walls)
res["pipeline"] = {{"walls": [round(w, 1) for w in pipe_walls],
                    "median_wall": round(pmed, 1),
                    "best_wall": round(min(pipe_walls), 1),
                    "kg_triples": n_kg,
                    "triples_per_sec": round(n_kg / pmed),
                    "best_triples_per_sec": round(n_kg / min(pipe_walls))}}
print("MEASURE " + json.dumps(res))
'''


def run(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args], capture_output=True, text=True, timeout=5400
    )
    return out.stdout + out.stderr


def main():
    global PIPE_DIR
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pipe_k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    assert Path(f"{SCALE_DIR}/lineitem.parquet").exists(), (
        "run tools/bench_scaling.py first to build the inflated input"
    )
    if pipe_k != 256:
        PIPE_DIR = f"/dev/shm/scale_input_pipe{pipe_k}"
        if not Path(f"{PIPE_DIR}/documents.parquet").exists():
            prep = _PREP_PIPE.format(repo=REPO, src=SRC, pipe_dir=PIPE_DIR)
            assert "PREP_DONE" in run(prep, str(pipe_k))
    results = {}
    for cpus in (n, 4 * n):
        subprocess.run(["sync"])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
        out = run(_MEASURE.replace("/dev/shm/scale_input_pipe", PIPE_DIR), str(cpus), "64", str(runs))
        line = [l for l in out.splitlines() if l.startswith("MEASURE ")][-1]
        results[cpus] = json.loads(line[len("MEASURE "):])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
    r_n, r_4n = results[n], results[4 * n]
    eff = {
        "dump": round((r_4n["auto"]["triples_per_sec"] / r_n["auto"]["triples_per_sec"]) / 4, 3),
        "pipeline": round(
            (r_4n["pipeline"]["triples_per_sec"] / r_n["pipeline"]["triples_per_sec"]) / 4, 3
        ),
    }
    best = {
        "dump": round(
            (r_4n["auto"]["best_triples_per_sec"] / r_n["auto"]["best_triples_per_sec"]) / 4, 3
        ),
        "pipeline": round(
            (r_4n["pipeline"]["best_triples_per_sec"] / r_n["pipeline"]["best_triples_per_sec"])
            / 4,
            3,
        ),
    }
    summary = {
        "n_cores": n,
        "runs": runs,
        "pipe_k": pipe_k,
        "eff": eff,
        "eff_best_run": best,
        "raw": results,
    }
    (REPO / "BENCH" / "scaling_linear.json").write_text(json.dumps(summary) + "\n")
    with open(REPO / "BENCH" / "scaling_history.jsonl", "a") as f:
        f.write(json.dumps({"kind": "linear", **summary}) + "\n")
    print(f"LINEAR eff_dump={eff['dump']} eff_pipeline={eff['pipeline']} best={best}")


if __name__ == "__main__":
    main()
