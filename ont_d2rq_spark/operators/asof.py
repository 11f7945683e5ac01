"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the LATEST right row with
``right.ts <= left.ts`` within the same key group (the temporal lookup
every event-enrichment pipeline needs; the reference has no temporal
operators, this is a task-brief extension).

Physical shape (scale-correct, one shuffle, no per-row Python):
  union both sides tagged → window per key ordered by (ts, side) →
  last(right payload, ignoreNulls) carried forward → keep left rows.
Equivalent to a merge-asof, executed as a single partitioned sort —
no range cross-product, no pandas.  Skewed keys are handled by AQE;
a per-key salt is unnecessary because the window is a linear scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left rows + latest right_cols as of left.on, matched on `by`.

    ``on``: timestamp/orderable column name present on both sides.
    ``by``: equality key present on both sides.
    Right rows at exactly the same ``on`` value sort BEFORE left rows
    (side tag 0 < 1), so an equal-timestamp right row does match.

    NULL semantics (SQL ASOF JOIN equality): right rows with a NULL
    key or NULL timestamp never match anything (filtered up front), and
    left rows with a NULL key/timestamp come out unmatched (their
    window partition contains no right rows).  The carried value is the
    whole right-row STRUCT keyed on a non-null marker — so a matching
    right row whose payload value IS NULL correctly yields NULL instead
    of leaking an older non-null payload (last(col, ignorenulls) would
    skip it).

    Ties: multiple right rows with equal (by, on) are ordered by a
    stable hash of their payload (``_tie``), so the carried row is
    deterministic across runs/partitionings instead of whichever row
    the shuffle happened to deliver last."""
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_tie", F.lit(0).cast("bigint")
    )
    rt = (
        right.filter(F.col(by).isNotNull() & F.col(on).isNotNull())
        .select(
            F.col(by).alias(by),
            F.col(on).alias(on),
            F.lit(0).alias("_side"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("_tie", F.xxhash64(*[F.col(c) for c in right_cols]))
    )
    for c in right_cols:
        if c in left.columns:
            raise ValueError(f"right column {c!r} collides with left; rename first")
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carry = F.last(
        F.when(
            F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])
        ),
        ignorenulls=True,
    ).over(w)
    out = merged.withColumn("_carry", carry)
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col("_carry")[c])
    return out.filter(F.col("_side") == 1).drop(
        "_side", "_tie", "_carry", *right_cols
    )
