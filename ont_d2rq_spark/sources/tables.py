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


_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
}


def balanced_read(
    spark: SparkSession,
    path: str,
    min_split_bytes: int = 1 << 20,
    target_partitions: int | None = None,
    fmt: str | None = None,
    schema: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Load a mapped table from any Spark file source.

    Format is taken from ``fmt`` or inferred from the path extension
    (the reference's analogue is the JDBC driver choice in
    map/Database; here a D2RQ "database" is a directory of files).
    ``schema`` is a DDL string — REQUIRED practice for csv/json at
    scale: without it Spark schema-inference runs an extra full scan
    of the source before the real job."""
    if fmt is None:
        base = path[:-1] if path.endswith("/") else path
        fmt = _EXT_FORMAT.get(os.path.splitext(base)[1].lower(), "parquet")
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        if path.rstrip("/").endswith(".tsv"):
            opts.setdefault("sep", "\t")
        if schema is None:
            opts.setdefault("inferSchema", "true")
    reader = spark.read.format(fmt).options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_parts >= target_partitions or _path_bytes(path) < min_split_bytes:
        return df
    return df.repartition(target_partitions)
