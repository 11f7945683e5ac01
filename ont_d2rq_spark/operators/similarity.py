"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (one broadcast of the query
side, JVM-only arithmetic via zip_with/aggregate).
Scale path: random-hyperplane LSH bucketing (signed projections →
bit signature → candidates share a signature prefix) — at 100 TB the
cross product is infeasible; LSH bounds each probe to its bucket.

The hyperplanes are generated DETERMINISTICALLY from xxhash64 of
(plane index, dimension index) — no RNG, same planes on every
executor and every run, nothing shipped over the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    n = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (n(a) * n(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector.  Query side is
    broadcast (queries ≪ corpus); ranking via window row_number with a
    deterministic tiebreak."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    q = queries.select(F.col(q_id_col).alias("q_id"), _as_double(vec_col).alias("qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("q_id"))
        .select(
            "q_id",
            "id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _lsh_sig_udf(dim: int, planes: int, tables: int):
    """Vectorized signature kernel: one numpy matmul per Arrow batch
    computes ALL table signatures (bits of V @ H^T ≥ 0, packed to
    int64 per table).  Hyperplanes come from a FIXED seed → identical
    on every executor and every run; nothing is shipped."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(42)
    H = rng.standard_normal((tables * planes, dim))
    weights = (1 << np.arange(planes, dtype=np.int64))

    def _sigs(vecs):
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ H.T) >= 0  # (n, tables*planes)
        bits = bits.reshape(len(V), tables, planes)
        packed = (bits * weights).sum(axis=2)  # (n, tables) int64
        return pd.Series(list(packed))

    return pandas_udf(_sigs, T.ArrayType(T.LongType()))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: multi-table random-hyperplane LSH.  Candidates = vectors
    sharing a bucket in ANY of `tables` signature tables; exact cosine
    ranks within the candidate set.  Recall ≈ 1-(1-p^planes)^tables.

    Physical shape (scale-correct): signatures via one Arrow-batched
    matmul, posexplode to (id, table, bucket), shuffle equi-join on
    (table, bucket) — candidate volume is bounded by bucket sizes,
    never the corpus×query cross product."""
    sig_udf = _lsh_sig_udf(dim, planes, tables)

    def banded(df, idn):
        return (
            df.select(
                F.col(id_col).alias(idn),
                _as_double(vec_col).alias(idn + "_v"),
                sig_udf(F.col(vec_col)).alias("sigs"),
            )
            .select(idn, idn + "_v", F.posexplode("sigs").alias("t", "bucket"))
        )

    c = banded(corpus, "id")
    q = F.broadcast(banded(queries, "q_id"))
    scored = (
        c.join(q, ["t", "bucket"])
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", "id_v", "q_id_v")
        .dropDuplicates(["q_id", "id"])
        .select(
            "q_id",
            "id",
            F.round(cosine(F.col("id_v"), F.col("q_id_v")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
