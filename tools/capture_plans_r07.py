#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into
plans/r07/<query>_<suffix>.txt.

Usage: python tools/capture_plans_r07.py <repo_root> <suffix> [out_dir]
  repo_root: tree whose code to run (the round-start worktree for
             'before', this repo for 'after')
  suffix:    'before' | 'after'
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r07")
SF = "/root/testdata/sf0.1"

sys.path.insert(0, ROOT)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    from ont_d2rq_spark.session import get_spark, ship_package

    spark = get_spark(app=f"plans_{SUFFIX}", master="local[8]", shuffle_partitions=16)
    ship_package(spark)

    def explain_str(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def save(name, df):
        (OUT / f"{name}_{SUFFIX}.txt").write_text(explain_str(df))
        print("captured", name, flush=True)

    from ont_d2rq_spark.examples import tpch_mapping
    from ont_d2rq_spark.graph import VirtualGraph
    from ont_d2rq_spark.queries import QUERIES

    g = VirtualGraph(tpch_mapping(SF), spark)
    save("dump_triples", g.triples(fuse=True, distinct="auto"))
    save("dump_triples_distinct", g.triples(fuse=True, distinct=True))
    save("find_point_lookup", g.find(s="http://example.org/customer/7"))

    for name in (
        "bgp_join",
        "agg_pricing_summary",
        "similarity_topk",
        "embedding_near_dup_lsh",
        "sessionize",
        "sparql_agg",
        "sparql_nested_optional",
        "ngram_jaccard_pairs",
        "simhash_near_dup",
        "pipeline_kg",
    ):
        try:
            save(name, QUERIES[name](spark, SF))
        except Exception as e:  # capture failures visibly, keep going
            (OUT / f"{name}_{SUFFIX}.txt").write_text(f"CAPTURE FAILED: {e!r}\n")
            print("FAILED", name, repr(e), flush=True)

    from ont_d2rq_spark.operators.dedup import minhash_dedup
    from ont_d2rq_spark.sources.tables import balanced_read

    docs = balanced_read(spark, f"{SF}/documents.parquet")
    save("minhash_dedup", minhash_dedup(docs, threshold=0.5, hash_family="xxhash64"))
    save("minhash_dedup_md5", minhash_dedup(docs, threshold=0.5, hash_family="md5"))

    spark.stop()


if __name__ == "__main__":
    main()
