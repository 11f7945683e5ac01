"""Connected components via alternating large-star / small-star.

The canonicalization step of the north-star pipeline (SURVEY.md §7.4 ④):
candidate owl:sameAs edges → equivalence classes → canonical member.

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature; no Spark built-in exists):

  large-star: for each edge (u,v) attach every neighbor larger than u
              to u's current minimum neighbor;
  small-star: re-orient edges toward each node's minimum neighbor.

Both rounds are groupBy-aggregate + re-emission — pure shuffles on the
node id, no driver-side state.  Convergence in O(log^2 n) rounds (in
practice a handful); each iteration is localCheckpoint()ed to truncate
lineage (hard part #3: without truncation the plan doubles per round
and Catalyst analysis time explodes at scale).

Skew: power-law degree (hub entities) is handled by AQE skew-join plus
the fact that both stars only carry (node, min_neighbor) pairs —
the reduce is a min() aggregate, which Spark executes with map-side
partial aggregation, so a hub's fan-in is combined per-partition
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected → canonical directed (large id → small id), no loops."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Attach all neighbors > u to min(neighbors ∪ {u})."""
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", F.col("u")).alias("mn"))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Re-orient: every neighbor ≤ u (plus u itself) links to the min.

    The output is already canonically oriented, so no greatest/least
    re-canonicalization (and its extra distinct EXCHANGE) is needed
    (r7): with input rows u > v, mn = min over u's neighbors satisfies
    mn ≤ v for the (v, mn) branch — equality removed by the u ≠ v
    filter — and mn < u strictly for the (u, mn) branch; every emitted
    row therefore has u > v already.  (Both star steps preserve the
    orientation invariant: _large_star emits (v', mn) with
    v' > orig_u ≥ mn.)  Pinned by test_small_star_orientation."""
    nbrs = e.select("u", "v")  # already u > v
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        nbrs.join(m, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .unionByName(m.select(F.col("u"), F.col("mn").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint: bool = True,
    check_every: int = 1,
) -> DataFrame:
    """→ DataFrame(node, component) — component = min node id reachable.

    Nodes are whatever orderable type the edge columns carry (string
    URIs or longs).  Isolated nodes don't appear (no edges → themselves
    canonical); callers union them back if needed.

    Barrier budget: ONE Spark job per iteration — the localCheckpoint is
    LAZY and the convergence fingerprint's aggregate is the action that
    materializes its blocks (an eager checkpoint plus a separate
    fingerprint job would double the serial barrier count, which is
    what dominates wall-clock for small/medium graphs).  ``check_every``
    > 1 skips the fingerprint on intermediate rounds (lineage then
    spans ≤ check_every rounds before truncation) at the risk of up to
    check_every-1 extra rounds after the fixpoint.
    """
    e = _canon_edges(edges, src, dst)

    def _sig(df):
        # set fingerprint: (count, sum of row hashes).  Both iterates are
        # DISTINCT canonical edge sets, so equal fingerprints ⇒ equal
        # sets (collision odds ~2^-64).  ONE aggregate job per iteration
        # instead of two exceptAll anti-joins — at power-law edge scale
        # the convergence check would otherwise cost as much as the step.
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long sum of hashes overflows under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    if checkpoint:
        e = e.localCheckpoint(eager=False)
    sig = _sig(e) if checkpoint else None  # materializes e's blocks
    for i in range(max_iterations):
        e2 = _small_star(_large_star(e))
        if checkpoint:
            e2 = e2.localCheckpoint(eager=False)
        if (i + 1) % check_every == 0 or i == max_iterations - 1:
            sig2 = _sig(e2)  # one action: materializes + fingerprints
            e = e2
            if sig2 == sig:
                break
            sig = sig2
        else:
            e = e2
    # closure: every node (including former hubs) → its min root
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(comp, "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return comp.unionByName(roots)


def canonicalize_sameas(
    triples_or_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    alias_prefix: str = None,
    check_every: int = 1,
) -> DataFrame:
    """sameAs edge list → (uri, canonical_uri) mapping, including the
    canonical member mapping to itself.  Apply with a broadcast or
    shuffle join over subj/obj to rewrite a triple table.

    ``alias_prefix``: URIs starting with it (mention-alias nodes) are
    demoted when electing the component representative, so the canonical
    id is a real entity URI whenever one is in the component."""
    cc = connected_components(
        triples_or_edges, src, dst, max_iterations, check_every=check_every
    )
    if alias_prefix is None:
        return cc.select(
            F.col("node").alias("uri"), F.col("component").alias("canonical_uri")
        )
    rank = F.when(F.col("node").startswith(alias_prefix), F.lit(1)).otherwise(F.lit(0))
    # representative = min (rank, uri) per component — one extra min-agg
    rep = (
        cc.withColumn("key", F.concat(rank.cast("string"), F.lit("|"), F.col("node")))
        .groupBy("component")
        .agg(F.min("key").alias("rep_key"))
        .select(
            "component", F.substring_index("rep_key", "|", -1).alias("canonical_uri")
        )
    )
    return cc.join(rep, "component").select(
        F.col("node").alias("uri"), "canonical_uri"
    )


def rewrite_triples_canonical(
    triples: DataFrame, mapping: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Rewrite subj/obj through the canonical mapping (left joins keep
    URIs that were never merged).

    ``broadcast=True`` (default) forces broadcast hash joins: the
    mapping is the CC output — an ITERATIVE subplan whose size Catalyst
    cannot estimate, so without the hint it picks SortMergeJoin and the
    full triple table shuffles TWICE (measured: 30k-row map vs 27M
    triples chose SMJ).  An alias→canonical map is bounded by distinct
    surface forms, far below the triple count; pass broadcast=False
    only when the map itself is beyond executor memory, and AQE's
    skew-join handles the shuffle."""
    m_s = mapping.withColumnsRenamed({"uri": "subj", "canonical_uri": "_cs"})
    m_o = mapping.withColumnsRenamed({"uri": "obj", "canonical_uri": "_co"})
    if broadcast:
        m_s, m_o = F.broadcast(m_s), F.broadcast(m_o)
    out = (
        triples.join(m_s, "subj", "left")
        .join(m_o, "obj", "left")
        .withColumn("subj", F.coalesce("_cs", "subj"))
        .withColumn(
            "obj",
            F.when(~F.col("is_literal"), F.coalesce("_co", "obj")).otherwise(F.col("obj")),
        )
        .drop("_cs", "_co")
    )
    return out.select("subj", "pred", "obj", "obj_datatype", "obj_lang", "is_literal")
