"""Deduplication operators for large-scale training-data pipelines.

Not in the d2rq reference (its DISTINCT is SURVEY §2.7 U2); these are
the scale extensions the task brief names.  All hashing is JVM-side
(`xxhash64`, `md5`, bit ops) — no Python in the row path.

Scale notes (100 TB):
  * exact_dedup: one shuffle on a 16-byte digest; map-side partial agg.
  * minhash_lsh: signatures are computed in one projection (k hashes ×
    one xxhash64 each over the shingle array via F.transform + min) —
    no shuffle; banding explodes to b rows/doc and groups on the band
    hash, so the shuffle volume is b × docs, independent of doc length.
    Candidate verification re-joins only bucket-mates.
  * simhash: 64-bit signature via per-bit weighted majority, joined on
    bands of the signature for hamming-neighbor candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to default parallelism when the source is
    under-split.  The shingle/token explosion below multiplies each
    input row into hundreds of CPU-heavy rows, so a poorly-split source
    (single-row-group parquet, one small file) would serialize the
    WHOLE operator onto one core no matter the cluster size — the
    repartition shuffles only the (id, text) projection, which is
    trivially cheap next to the work it unlocks.  (balanced_read's
    size-based repair intentionally skips small files because small
    DIMENSION tables shouldn't shuffle; a dedup corpus is the opposite
    case: bytes small, per-byte CPU huge.)"""
    sc = df.sparkSession.sparkContext
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    p = sc.defaultParallelism
    return df.repartition(p) if n < p else df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (fp, representative, n_dups): groups of byte-identical
    (normalized) documents; representative = min id (deterministic)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle array (distinct), pure Catalyst."""
    toks = F.split(normalize_text(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# Mersenne prime 2^31-1: keeps every product a_j*h below 2^62, so the
# permutation arithmetic stays exact in 64-bit integers on BOTH engines
# (Spark BIGINT and DuckDB BIGINT compute bit-identical results).
MINHASH_PRIME = 2147483647


def minhash_perm_coeffs(num_hashes: int, salt: str = "minhash") -> list:
    """Deterministic (a_j, b_j) pairs for the Broder 2-universal
    permutation family g_j(x) = (a_j·h1 + b_j·h2) mod p.  Derived from
    md5 of the salt+index so Spark and the DuckDB oracle share the
    identical constants without any runtime randomness."""
    import hashlib

    out = []
    for j in range(num_hashes):
        a = int(hashlib.md5(f"{salt}:{j}:a".encode()).hexdigest(), 16) % (MINHASH_PRIME - 1) + 1
        b = int(hashlib.md5(f"{salt}:{j}:b".encode()).hexdigest(), 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """→ (id, sig: array<bigint>) — sig[j] = min over shingles of
    hash_j(shingle).

    Two families, SAME plan shape and SAME Broder construction — each
    shingle is hashed into two base values (h1, h2) reduced mod
    p = 2³¹−1, and the k per-seed hashes are the arithmetic
    permutations g_j = (a_j·h1 + b_j·h2) mod p, ~k× less hashing on
    the dominant stage than k independent seeded hashes:
      * 'xxhash64' — two seeded JVM xxhash64 calls per shingle
        (fastest when only one engine needs to replay);
      * 'md5'      — one md5 split into two 60-bit halves; DuckDB
        replays the identical integer arithmetic for the driver
        oracle.

    Shape: explode shingles → k hash columns → groupBy(id).agg(k mins).
    The k mins run with map-side partial aggregation, so the shuffle
    carries one k-wide row per (id, partition) — NOT one row per
    shingle.  (A single wide projection of k array_min(transform(...))
    expressions looks cheaper but Catalyst's projection collapse
    re-inlines the shingle computation k times — measured 40× slower.)"""
    ex = (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")))
        .select("id", F.explode(shingles(F.col("t"), shingle_n)).alias("s"))
    )
    p = F.lit(MINHASH_PRIME)
    if hash_family == "md5":
        ex = ex.select("id", F.md5("s").alias("m")).select(
            "id",
            (F.conv(F.substring("m", 1, 15), 16, 10).cast("long") % p).alias("h1"),
            (F.conv(F.substring("m", 17, 15), 16, 10).cast("long") % p).alias("h2"),
        )
    else:
        # same Broder construction over two seeded xxhash64 calls —
        # 2 hashes per shingle instead of k (pmod keeps both halves
        # non-negative before the permutation arithmetic)
        ex = ex.select(
            "id",
            F.pmod(F.xxhash64(F.col("s"), F.lit(1)), p).alias("h1"),
            F.pmod(F.xxhash64(F.col("s"), F.lit(2)), p).alias("h2"),
        )
    coeffs = minhash_perm_coeffs(num_hashes)
    mins = [
        F.min((F.lit(a) * F.col("h1") + F.lit(b) * F.col("h2")) % p).alias(f"h{j}")
        for j, (a, b) in enumerate(coeffs)
    ]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair.
    → (id_a, id_b) distinct, id_a < id_b."""
    assert bands * rows_per_band <= 1024
    bucket_fn = F.md5 if hash_family == "md5" else F.xxhash64
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket_fn(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact
    Jaccard verification over shingle sets → (id_a, id_b, jaccard).
    Verification joins the shingle arrays back only for candidates."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, hash_family)
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band, hash_family)
    sh = spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    ).select("id", shingles(F.col("t"), shingle_n).alias("sh"))
    joined = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word tokens: bit i of the signature is the
    majority vote of bit i across token hashes.  Pure Catalyst:
    per-bit sum of ±1 via aggregate over the token-hash array."""
    df = spread(df)
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_sum = lambda i: F.aggregate(
        hashes,
        F.lit(0),
        lambda acc, h: acc
        + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
    )
    sig = F.aggregate(
        F.array(*[F.when(bit_sum(i) > 0, F.lit(1 << i if i < 63 else -(2**63))).otherwise(F.lit(0)) for i in range(64)]),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_signatures_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """Cross-engine-replayable SimHash: the per-token 60-bit hash is
    the first 15 hex chars of md5 (both Spark and DuckDB compute the
    identical value — `conv(hex,16,10)` here, `'0x…'::BIGINT` there),
    so the driver oracle replays the signature bit-for-bit.

    Shape: explode distinct tokens (md5 computed ONCE per token) →
    groupBy(id) with `bits` conditional ±1 sums (map-side partial agg)
    → signature assembled from the sign of each bit sum.  One shuffle,
    keyed on doc id — scale-equivalent to the xxhash64 path."""
    assert bits <= 60
    ex = (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")))
        .select(
            "id",
            F.explode(
                F.array_distinct(F.split(normalize_text(F.col("t")), " "))
            ).alias("w"),
        )
        .select(
            "id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h")
        )
    )
    sums = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("simhash"))


def hamming_distance(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(sigs: DataFrame, max_hamming: int = 3, bits: int = 64) -> DataFrame:
    """Near-dup candidates by SimHash: block on bit quarters (a pair
    within hamming ≤ 3 shares at least one identical quarter —
    pigeonhole; larger max_hamming keeps the same blocking as a
    recall-bounded candidate generator), then verify the full distance."""
    width = bits // 4
    mask = (1 << width) - 1
    parts = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("simhash", q * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("part"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("p"),
    ).select("id", "simhash", "p.q", "p.part")
    a, b = parts.alias("a"), parts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.part") == F.col("b.part"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold.  Exact (all-pairs);
    for the bucketed scale path see operators/similarity.py."""
    e = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (norm(F.col("a.v")) * norm(F.col("b.v"))), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
