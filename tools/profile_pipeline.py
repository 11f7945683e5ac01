#!/usr/bin/env python
"""Profile build_kg stage-by-stage at sf0.1 (drift bisect, round 6).

Usage: python tools/profile_pipeline.py [n_runs]
Prints per-stage and total wall for each run on a fresh cache.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from ont_d2rq_spark.session import get_spark, ship_package

    spark = get_spark(app="profile", master="local[32]", shuffle_partitions=64)
    ship_package(spark)
    from ont_d2rq_spark.pipeline.docs import (
        assert_span_integrity,
        build_kg,
        detect_mentions,
        link_entities,
        mention_triples,
        synthesize_interleaved,
    )
    from pyspark.sql import functions as F

    for run in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = build_kg(spark, SF, root=None)
        cnt = out.count()
        total = time.perf_counter() - t0
        print(f"run {run}: build_kg total {total:.2f}s rows={cnt}", flush=True)

    # stage-level: fresh cache, persist chain mirrored manually
    from pyspark import StorageLevel

    spark.catalog.clearCache()
    stages = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        return r

    docs = synthesize_interleaved(spark, SF).persist(StorageLevel.MEMORY_AND_DISK)
    timed("synth+integrity", lambda: assert_span_integrity(docs))
    mentions = detect_mentions(docs).persist(StorageLevel.MEMORY_AND_DISK)
    timed("mentions", lambda: mentions.count())
    links = link_entities(mentions, spark, SF).persist(StorageLevel.MEMORY_AND_DISK)
    timed("links", lambda: links.count())
    raw = mention_triples(links).persist(StorageLevel.MEMORY_AND_DISK)
    timed("raw_triples", lambda: raw.count())

    from ont_d2rq_spark.operators.cc import (
        canonicalize_sameas,
        rewrite_triples_canonical,
    )

    OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    EX = "http://example.org/"

    def canon_fn():
        sameas = raw.filter(F.col("pred") == OWL_SAMEAS).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        return canonicalize_sameas(
            sameas, alias_prefix=EX + "entity/", check_every=1
        ).persist(StorageLevel.MEMORY_AND_DISK)

    canon = timed("cc_canon", canon_fn)
    timed("cc_count", lambda: canon.count())
    final = rewrite_triples_canonical(
        raw.filter(F.col("pred") != OWL_SAMEAS), canon
    ).dropDuplicates(["subj", "pred", "obj", "obj_datatype", "obj_lang"])
    timed("rewrite+dedup", lambda: final.count())
    print("stages:", stages, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
