"""Transitive closure over an edge DataFrame — the engine behind the
SPARQL `p+` property path (reference: ARQ evaluates property paths in
memory after D2RQ's BGP translation; here the closure is a distributed
iterated-squaring join).

Iterated squaring: after round i the result holds every path of length
≤ 2^i, so rounds = ⌈log2(diameter)⌉ — 20 rounds cover diameter 1M.
Each round is one self-join + distinct (shuffle on the join key), with
LAZY localCheckpoint lineage truncation materialized by the
convergence count — one job per round, same barrier discipline as
operators/cc.py.

Scale: the result can be quadratic in the worst case (dense DAG);
for the sparse hierarchies property paths traverse (type trees,
part-of chains) it stays near-linear.  AQE handles skewed hub nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """→ all (src, dst) connected by a directed path of length ≥ 1
    (a node on a cycle reaches itself, per SPARQL `p+` semantics)."""
    e = edges.select(src, dst).distinct()
    e = e.localCheckpoint(eager=False)
    n = e.count()  # materializes the seed
    result = e
    for _ in range(max_iterations):
        step = (
            result.alias("a")
            .join(result.alias("b"), F.col(f"a.{dst}") == F.col(f"b.{src}"))
            .select(F.col(f"a.{src}").alias(src), F.col(f"b.{dst}").alias(dst))
        )
        grown = (
            result.unionByName(step)
            .distinct()
            .localCheckpoint(eager=False)
        )
        n2 = grown.count()  # one action: materializes + converge-checks
        result = grown
        if n2 == n:
            break
        n = n2
    return result
