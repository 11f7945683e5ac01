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


_BYTE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Spark byte-size string ('128m', '1g', '134217728', '128mb') → bytes."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _BYTE_SUFFIX:
        return int(float(s[:-1]) * _BYTE_SUFFIX[s[-1]])
    try:
        return int(s)
    except ValueError:
        return 128 << 20


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
    # Session-scoped handle cache: every fresh VirtualGraph/compiler
    # re-opened its tables, and each first load() runs a schema/footer
    # job plus driver planning.  A DataFrame is an immutable lazy plan,
    # so the handle is safely shared; the key carries the source's
    # (mtime, size) so a rewritten path is re-opened (a cached scan
    # pins its file listing).  This caches PLANS, never results.
    try:
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    cache = getattr(spark, "_balanced_read_cache", None)
    if cache is None:
        cache = spark._balanced_read_cache = {}
    key = (
        path,
        fmt,
        schema,
        tuple(sorted(opts.items())),
        min_split_bytes,
        target_partitions,
        stamp,
    )
    if stamp is not None and key in cache:
        return cache[key]
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
    # Estimate the scan's split count from on-disk bytes instead of
    # materializing df.rdd (each .rdd call converts the whole logical
    # plan to a physical RDD DAG — several hundred ms of driver/py4j
    # work PER TABLE, measured as the serial job cascade at the front
    # of every dump).  A file-source scan packs splits of
    # maxPartitionBytes (+ openCostInBytes per file), so splits ≈
    # ceil(bytes / maxPartitionBytes) — exact for the single-file
    # tables this engine maps, conservative for directories.
    def done(out):
        if stamp is not None:
            cache[key] = out
        return out

    total = _path_bytes(path)
    if total < min_split_bytes:
        return done(df)
    max_split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_splits = max(1, -(-total // max_split))
    if est_splits >= target_partitions:
        return done(df)
    return done(df.repartition(target_partitions))
