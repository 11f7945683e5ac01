"""SPARQL-surface 2→8 scaling (BASELINE.md B4, round-5 addition).

The dump and doc-pipeline B4 numbers cover the mapping compiler and the
LLM-data operators; this harness gives the SPARQL front-end the same
two-cluster-size evidence the north rule asks for, on the soak's ×64
query: a 9.6M-row BGP join over minted URIs (orders ⋈ customers), an
`inRegion+` distributed closure, and two nested compat OPTIONALs
sharing a maybe-unbound var (the r5 null-mask decomposition path).

Protocol identical to the other harnesses: 2→8 cores (this box's
linear region — see BENCH/BASELINE.md box-ceiling section), fresh JVM
per level, un-timed warm-up, median of N runs, fresh plan per run, a
noop sink, RAM-backed local dir.  Input: /dev/shm/soak_tpch (built by
tools/soak_pipeline.py's build_tpch_input; this harness builds it too
when missing).  Writes BENCH/scaling_sparql.json and folds the
efficiency into BENCH/scaling.json (embedded by bench.py).

Usage: python tools/bench_scaling_sparql.py [N=2] [runs=3]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SOAK_TPCH = "/dev/shm/soak_tpch"  # x64 (soak); the harness scales K up

_PREP = '''
import sys
sys.path.insert(0, "{repo}")
sys.path.insert(0, "{repo}/tools")
from ont_d2rq_spark.session import get_spark
import soak_pipeline
spark = get_spark(master="local[32]", shuffle_partitions=64)
soak_pipeline.build_tpch_input(spark, k={k}, dest="{tpch}")
print("PREP_DONE")
'''

_MEASURE = '''
import time, sys, json, statistics
sys.path.insert(0, "{repo}")
sys.path.insert(0, "{repo}/tools")
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
from ont_d2rq_spark.sparql import execute
from soak_pipeline import SOAK_SPARQL

def run_once():
    g = VirtualGraph(tpch_mapping("{tpch}"), spark)
    t0 = time.perf_counter()
    execute(g, SOAK_SPARQL).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

g0 = VirtualGraph(tpch_mapping("{tpch}"), spark)
n = execute(g0, SOAK_SPARQL).count()
run_once()  # warm-up, un-timed
walls = [run_once() for _ in range(runs)]
med = statistics.median(walls)
print("MEASURE " + json.dumps({{"cpus": cpus, "rows": n,
  "walls": [round(w,1) for w in walls], "median_wall": round(med,1),
  "best_wall": round(min(walls),1),
  "rows_per_sec": round(n/med), "best_rows_per_sec": round(n/min(walls))}}))
'''


def run(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args], capture_output=True, text=True, timeout=5400
    )
    return out.stdout + out.stderr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    tpch = SOAK_TPCH if k == 64 else f"/dev/shm/scale_tpch_{k}"
    if not Path(f"{tpch}/orders.parquet").exists():
        assert "PREP_DONE" in run(_PREP.format(repo=REPO, k=k, tpch=tpch))
    results = {}
    for cpus in (n, 4 * n):
        subprocess.run(["sync"])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
        out = run(_MEASURE.format(repo=REPO, tpch=tpch), str(cpus), "64", str(runs))
        lines = [l for l in out.splitlines() if l.startswith("MEASURE ")]
        if not lines:
            print(out[-3000:])
            raise SystemExit("no MEASURE line")
        results[cpus] = json.loads(lines[-1][len("MEASURE "):])
        subprocess.run(["rm", "-rf", "/dev/shm/spark-bench-local"])
    r_n, r_4n = results[n], results[4 * n]
    eff = round((r_4n["rows_per_sec"] / r_n["rows_per_sec"]) / 4, 3)
    best = round((r_4n["best_rows_per_sec"] / r_n["best_rows_per_sec"]) / 4, 3)
    summary = {"n_cores": n, "runs": runs, "k": k, "eff_sparql": eff, "eff_best_run": best, "raw": results}
    (REPO / "BENCH" / "scaling_sparql.json").write_text(json.dumps(summary) + "\n")
    with open(REPO / "BENCH" / "scaling_history.jsonl", "a") as f:
        f.write(json.dumps({"kind": f"sparql_x{k}", **summary}) + "\n")
    # fold into the consolidated B4 verdict bench.py embeds
    sc_path = REPO / "BENCH" / "scaling.json"
    sc = json.loads(sc_path.read_text())
    sup = sc.setdefault("supplemental", {}).setdefault("sparql_surface", {})
    sup["eff"] = eff
    sup["eff_best_run"] = best
    sup["measurement"] = (
        f"{n}->{4*n} cores, x{k} tpch facts ({r_n['rows']} result rows), "
        f"median of {runs}"
    )
    sc_path.write_text(json.dumps(sc, indent=1))
    print(f"SPARQL eff={eff} best={best}")


if __name__ == "__main__":
    main()
