"""Table loading with scan-parallelism repair.

The driver test parquet files are written as ONE row group each, and a
parquet scan cannot split inside a row group — so every downstream
narrow operation (URI minting, encoding, explode) would run in a single
task per table no matter how many cores the cluster has.  On a real
100 TB Iceberg table this does not happen (many files / row groups);
when it does happen (badly-compacted uploads are common in ingest
pipelines), the standard repair is one round-robin repartition of the
poorly-split source before the CPU-heavy projection — Catalyst prunes
columns below the exchange, so only the needed columns are shuffled.

``balanced_read`` applies that repair only when needed: source splits
< cores AND the file is big enough that the shuffle pays for itself.
Small dimension tables stay unsplit (they broadcast anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _path_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def balanced_read(
    spark: SparkSession,
    path: str,
    min_split_bytes: int = 1 << 20,
    target_partitions: int | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_parts >= target_partitions or _path_bytes(path) < min_split_bytes:
        return df
    return df.repartition(target_partitions)
