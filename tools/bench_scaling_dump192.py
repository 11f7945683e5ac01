"""Dump-only 2→8 scaling at ×192 input (BASELINE.md B4).

The reference-semantics dump has no shuffle; its Amdahl-style serial
fraction is per-JOB driver work (planning, AQE, scan listing, noop
commit) — ~6.7 s/run by the fit on the ×48 input (t2=47.2, t8=16.8 →
s=6.7, w=81).  That fraction is CONSTANT in data size, so it vanishes
at real scale; measuring at ×192 (≈516 M triples) puts the job in the
regime where compute dominates it, the same way a 100 TB table would.

Protocol identical to bench_scaling_linear.py (fresh JVM per level,
un-timed warm-up, median of 5, fresh plan per run, noop sink,
RAM-backed local dir).  Writes BENCH/scaling_dump192.json.

Usage: python tools/bench_scaling_dump192.py [N=2] [runs=5] [K=192]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SRC = "/root/testdata/sf0.1"

_PREP = '''
import sys, functools
sys.path.insert(0, "{repo}")
from ont_d2rq_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", shuffle_partitions=64)
k = int(sys.argv[1])
def inflate(name, keycols, parts):
    df = spark.read.parquet(f"{src}/{{name}}.parquet")
    frames = []
    for i in range(k):
        f = df
        for c in keycols:
            f = f.withColumn(c, F.col(c) + F.lit(i * 1_000_000_000))
        frames.append(f)
    out = functools.reduce(lambda a, b: a.unionByName(b), frames)
    out.repartition(parts).write.mode("overwrite").parquet(f"{scale_dir}/{{name}}.parquet")
inflate("lineitem", ["l_orderkey"], 256)
inflate("orders", ["o_orderkey"], 128)
inflate("customer", ["c_custkey"], 64)
inflate("documents", ["doc_id"], 64)
for t in ["region", "nation", "supplier", "part", "events", "embeddings"]:
    spark.read.parquet(f"{src}/{{t}}.parquet").write.mode("overwrite").parquet(
        f"{scale_dir}/{{t}}.parquet")
print("PREP_DONE")
'''

_MEASURE = '''
import time, sys, json, statistics
sys.path.insert(0, "{repo}")
cpus, sp, runs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
  .config("spark.sql.shuffle.partitions", str(sp))
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.driver.memory", "56g")
  .config("spark.driver.extraJavaOptions", "-Xms24g -XX:+UseG1GC")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false")
  .config("spark.local.dir", "/dev/shm/spark-bench-local")
  .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph

def run_once():
    g = VirtualGraph(tpch_mapping("{scale_dir}"), spark)
    t0 = time.perf_counter()
    g.triples(fuse=True, distinct="auto").write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

n = VirtualGraph(tpch_mapping("{scale_dir}"), spark).triples(fuse=True).count()
run_once()  # warm-up, un-timed
walls = [run_once() for _ in range(runs)]
med = statistics.median(walls)
print("MEASURE " + json.dumps({{"cpus": cpus, "triples": n,
  "walls": [round(w,1) for w in walls], "median_wall": round(med,1),
  "best_wall": round(min(walls),1),
  "triples_per_sec": round(n/med), "best_triples_per_sec": round(n/min(walls))}}))
'''


def run(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args], capture_output=True, text=True, timeout=5400
    )
    return out.stdout + out.stderr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    scale_dir = f"/dev/shm/scale_input_{k}"
    if not Path(f"{scale_dir}/lineitem.parquet").exists():
        assert "PREP_DONE" in run(
            _PREP.format(repo=REPO, src=SRC, scale_dir=scale_dir), str(k)
        )
    results = {}
    for cpus in (n, 4 * n):
        subprocess.run(["sync"])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
        out = run(
            _MEASURE.format(repo=REPO, scale_dir=scale_dir), str(cpus), "64", str(runs)
        )
        line = [l for l in out.splitlines() if l.startswith("MEASURE ")][-1]
        results[cpus] = json.loads(line[len("MEASURE "):])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
    r_n, r_4n = results[n], results[4 * n]
    eff = round((r_4n["triples_per_sec"] / r_n["triples_per_sec"]) / 4, 3)
    best = round((r_4n["best_triples_per_sec"] / r_n["best_triples_per_sec"]) / 4, 3)
    summary = {"n_cores": n, "runs": runs, "k": k, "eff_dump": eff, "eff_best_run": best, "raw": results}
    (REPO / "BENCH" / "scaling_dump192.json").write_text(json.dumps(summary) + "\n")
    with open(REPO / "BENCH" / "scaling_history.jsonl", "a") as f:
        f.write(json.dumps({"kind": f"dump_x{k}", **summary}) + "\n")
    print(f"DUMP192 eff={eff} best={best}")


if __name__ == "__main__":
    main()
