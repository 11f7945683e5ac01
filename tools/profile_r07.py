#!/usr/bin/env python
"""Round-7 phase profiler: per-phase wall for the heavy bench queries
(dump, minhash both families, embedding LSH, similarity_topk), each
phase isolated with the noop sink (guide §1.4) and labelled
(guide §1.5).  Also samples /proc/loadavg around each phase so a
neighbor-load spike is visible in the artifact (VERDICT r6 item #1).

Usage: python tools/profile_r07.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_r07.json"


def loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def main():
    from pyspark.sql import functions as F

    from ont_d2rq_spark.session import get_spark, ship_package

    spark = get_spark(app="profile_r07", master="local[32]", shuffle_partitions=64)
    ship_package(spark)

    import pandas as pd

    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: (pd.DataFrame({"id": [0]}) for _ in it), "id long"
    ).count()

    res: dict = {"sf": SF, "phases": {}}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        l0 = loadavg()
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 3)
        res["phases"][name] = {"sec": dt, "load_pre": l0, "load_post": loadavg()}
        spark.sparkContext.setJobDescription(None)
        print(f"{name:45s} {dt:8.3f}s  load {l0[0]:.1f}->{loadavg()[0]:.1f}", flush=True)
        return out

    # ---------------- dump ----------------
    from ont_d2rq_spark.examples import tpch_mapping
    from ont_d2rq_spark.graph import VirtualGraph

    g = VirtualGraph(tpch_mapping(SF), spark)
    timed("dump.fused_auto_noop", lambda: noop(g.triples(fuse=True, distinct="auto")))
    timed("dump.fused_auto_noop_2nd", lambda: noop(g.triples(fuse=True, distinct="auto")))
    g2 = VirtualGraph(tpch_mapping(SF), spark)
    timed("dump.distinct_noop", lambda: noop(g2.triples(fuse=True, distinct=True)))

    # ---------------- minhash (both families) ----------------
    from ont_d2rq_spark.operators.dedup import (
        minhash_dedup,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from ont_d2rq_spark.sources.tables import balanced_read

    docs = balanced_read(spark, f"{SF}/documents.parquet")
    for fam in ("xxhash64", "md5"):
        sigs = minhash_signatures(docs, hash_family=fam)
        timed(f"minhash.{fam}.signatures_noop", lambda s=sigs: noop(s))
        cands = minhash_lsh_candidates(sigs, 16, 4, fam)
        timed(f"minhash.{fam}.candidates_noop", lambda c=cands: noop(c))
        timed(
            f"minhash.{fam}.full_count",
            lambda f=fam: minhash_dedup(docs, threshold=0.5, hash_family=f).count(),
        )

    # ---------------- embedding near-dup LSH ----------------
    from ont_d2rq_spark.operators.similarity import (
        lsh_banded,
        lsh_near_dup_pairs,
        rademacher_planes,
    )

    emb = balanced_read(spark, f"{SF}/embeddings.parquet")
    mats = rademacher_planes(64, 8, 32, "neardup")
    banded = lsh_banded(emb, "id", mats)
    timed("lsh.banded_noop", lambda: noop(banded))
    timed(
        "lsh.near_dup_full",
        lambda: lsh_near_dup_pairs(emb, dim=64, threshold=0.4, planes=8, tables=32, with_stats=True).count(),
    )

    # ---------------- similarity_topk ----------------
    from ont_d2rq_spark.queries import QUERIES

    timed("similarity_topk.full", lambda: QUERIES["similarity_topk"](spark, SF).count())
    timed("sessionize.full", lambda: QUERIES["sessionize"](spark, SF).count())
    timed("bgp_join.full", lambda: QUERIES["bgp_join"](spark, SF).count())

    Path(OUT).write_text(json.dumps(res, indent=1) + "\n")
    print("wrote", OUT, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
