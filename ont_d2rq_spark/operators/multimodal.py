"""Multimodal column plumbing: opaque binary media + typed metadata.

The interleaved-document model carries media as `media_ref` pointers
(or inline `binary` columns via Spark's `binaryFile` source — the
DownloadMap/BLOB analogue, SURVEY §2.1 S7).  The image/audio codec
libraries are NOT in this container, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything Spark-side —
schema, Arrow batch shape, mapInPandas partitioning, metadata typing —
is real and tested.

At scale: media bytes stay columnar in parquet/Iceberg; decode runs as
mapInPandas so each Arrow batch crosses into Python once; partitioning
by media kind keeps decoder state (model weights, codec contexts) warm
per task.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("hist", T.ArrayType(T.LongType())),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int]:
    """STUB decode: real impl would be PIL/libav — not in this container.
    Deterministic fake: dimensions derived from the byte length/first
    bytes so tests have exact expectations."""
    if not content:
        return 0, 0
    w = 16 + (content[0] % 64)
    h = 16 + (len(content) % 64)
    return w, h


def _fake_hist(content: bytes, dim: int = 8) -> list[int]:
    """STUB: integer byte-histogram (bucket = byte % dim).  Exact
    integers, so the driver's DuckDB oracle can replay it bit-for-bit."""
    buckets = [0] * dim
    for b in content:
        buckets[b % dim] += 1
    return buckets


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """STUB feature extractor (would be an ONNX/torch encoder).
    Deterministic: byte-histogram buckets, L1-normalized."""
    if not content:
        return [0.0] * dim
    buckets = _fake_hist(content, dim)
    s = float(sum(buckets)) or 1.0
    return [b / s for b in buckets]


def decode_media_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_ref, kind, content: bytes) batches →
    MEDIA_META_SCHEMA batches.  One Python crossing per Arrow batch."""
    for pdf in it:
        rows = []
        for ref, kind, content in zip(pdf["media_ref"], pdf["kind"], pdf["content"]):
            content = content or b""
            w, h = _fake_decode(content)
            rows.append(
                {
                    "media_ref": ref,
                    "kind": kind,
                    "n_bytes": len(content),
                    "width": w,
                    "height": h,
                    "hist": _fake_hist(bytes(content)),
                    "feature": _fake_feature(bytes(content)),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def decode_media(df: DataFrame) -> DataFrame:
    """df(media_ref, kind, content binary) → typed media metadata +
    feature vector.  Repartition by kind first so decoder state stays
    warm per task at scale."""
    return df.repartition("kind").mapInPandas(decode_media_batch, MEDIA_META_SCHEMA)


def media_refs_from_docs(docs: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved table and synthesize
    deterministic fake bytes for the stubbed decoder (real deployments
    read bytes via spark.read.format('binaryFile') or an object store)."""
    spans = docs.select(F.explode("spans").alias("s")).filter(
        F.col("s.media_ref").isNotNull()
    )
    fake_content = F.encode(
        F.concat(F.col("s.media_ref"), F.lit("#"), F.col("s.kind")), "utf-8"
    )
    return spans.select(
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
        fake_content.alias("content"),
    )
