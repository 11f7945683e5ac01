"""VirtualGraph — the Spark analogue of D2RQ's GraphD2RQ + SPARQL engine.

Reference layout (SURVEY.md §3):
  jena/GraphD2RQ.java            — graphBaseFind(s,p,o) over TripleRelations
  find/FindQuery.java, find/URIMakerRule.java — relation pruning + batching
  engine/GraphPatternTranslator.java, engine/NodeRelationJoiner.java
                                  — BGP → joined relations (join pushdown)
  ont-d2rq jena/CachingGraph.java — memoized find results

Spark-first re-expression:
  * find(s,p,o): plan-time binding — each bound term is inverted through
    every bridge's node maker into typed equality constraints (pruning
    relations whose pattern/datatype cannot match), constraints reach
    the parquet scan as pushed filters, survivors union into ONE job.
  * bgp([...patterns...]): each triple pattern → union of candidate
    bridge frames with node values projected to variable columns; shared
    variables become join keys; Catalyst picks broadcast/SMJ and AQE
    handles skew.  This is D2RQ's join pushdown without the SQL-string
    generation — the DataFrame DAG *is* the pushed-down query.
  * triples(): full materialization (dump-rdf): fused one-scan-per-table
    evaluation + global distinct.
  * cache(): persist hot bridge frames (CachingGraph analogue).
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ont_d2rq_spark.compiler.relation import (
    CompiledBridge,
    MappingCompiler,
    NodeSpec,
    TRIPLE_SCHEMA,
    coerce_constant,
    _qualify,
)
from ont_d2rq_spark.mapping.model import Mapping


class _Prune(Exception):
    """Bound node can never be produced by this relation."""


class Var(str):
    """A SPARQL-style variable in a BGP pattern (e.g. Var('x'))."""


class Lit(str):
    """A literal term with optional datatype/lang for TYPED matching —
    the analogue of the reference's TypedNodeMaker unification
    (nodes/TypedNodeMaker.java): a bound literal matches a relation
    only when the lexical form AND the datatype/lang agree.  A plain
    `str` term keeps the lexical-only wildcard semantics."""

    def __new__(cls, lexical: str, datatype: Optional[str] = None, lang: Optional[str] = None):
        self = super().__new__(cls, lexical)
        self.datatype = datatype
        self.lang = lang
        return self


def _is_var(term) -> bool:
    return isinstance(term, Var) or (
        isinstance(term, str) and not isinstance(term, Lit) and term.startswith("?")
    )


def _var_name(term) -> str:
    return term[1:] if isinstance(term, str) and term.startswith("?") else str(term)


class PathPlus:
    """SPARQL `pred+` / `pred*` / `pred?` property path over a base edge
    set — a single predicate, a PathGroup (`(p1/p2)+`), or a NegatedSet
    (`!p+`).  ``mod``:
      '+' — one-or-more hops: distributed transitive closure
            (operators/closure.py) over the predicate's edge set.
      '*' — zero-or-more: the '+' closure ∪ the zero-length identity.
      '?' — zero-or-one: the edge set ∪ the zero-length identity.
    Zero-length semantics follow ARQ: with a bound end the identity is
    that term alone; var-var matches every non-literal node in the
    graph (literal endpoints of zero-length paths are not emitted —
    companions aren't carried through closures)."""

    def __init__(self, pred, mod: str = "+"):
        self.pred = pred
        self.mod = mod

    def __repr__(self):
        return f"PathPlus({self.pred!r}, {self.mod!r})"


class NegatedSet:
    """SPARQL negated property set `!p` / `!(p1|p2|^q)` in predicate
    position: matches any edge whose predicate is NOT one of the listed
    IRIs.  ``fwd``/``inv`` are tuples of absolute predicate IRIs.
    bgp() evaluates a single-direction set by rewriting the pattern to
    an internal predicate variable (inverse members swap
    subject/object first) and post-filtering that column with NOT IN —
    the exclusion list is tiny, so Catalyst keeps the filter adjacent
    to the pattern's union frame.  A mixed set is the union of its two
    single-direction evaluations (each matches a different edge)."""

    def __init__(self, fwd=(), inv=()):
        self.fwd = tuple(fwd)
        self.inv = tuple(inv)

    def __repr__(self):
        return f"NegatedSet(fwd={self.fwd!r}, inv={self.inv!r})"


class PathGroup:
    """A parenthesized path group `(p1/p2/…)` used as the base of a
    repetition modifier — `(p1/p2)+` — carrying the group's expansion
    as triple patterns between the fixed endpoints ?__cs → ?__co.  The
    closure evaluator compiles the group with one bgp() call (inner
    PathPlus atoms recurse), then iterates over the resulting composite
    edge set."""

    def __init__(self, patterns: list):
        self.patterns = patterns

    def __repr__(self):
        return f"PathGroup({self.patterns!r})"


_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _norm_dt(dt: Optional[str]) -> Optional[str]:
    """RDF 1.1: a plain string literal IS an xsd:string literal — the
    datatype() FILTER builtin already maps plain → xsd:string, so
    typed-literal unification must treat the two as identical too."""
    return None if dt == _XSD_STRING else dt


_COMPANION_SUFFIXES = ("__dt", "__lang", "__islit")


def _triple_frame_single(tdf: DataFrame, s, p, o, swap: bool = False, pred_filter=None):
    """One (s, p, o) pattern over a triple frame → variable-column frame.
    ``swap`` evaluates the inverse direction (subject term against obj
    column and vice versa — used for inverse negated-set members);
    ``pred_filter`` adds a predicate-column condition (negated sets)."""
    f = tdf
    sel: list = []
    seen: dict = {}
    s_col, o_col = ("obj", "subj") if swap else ("subj", "obj")
    if pred_filter is not None:
        f = f.filter(pred_filter)
    for term, col in ((s, s_col), (p, "pred"), (o, o_col)):
        if term is None:
            continue
        if _is_var(term):
            v = _var_name(term)
            if v in seen:
                f = f.filter(F.col(col) == F.col(seen[v]))
                continue
            seen[v] = col
            sel.append(F.col(col).alias(v))
            if col == "obj":
                sel += [
                    F.col("obj_datatype").alias(f"{v}__dt"),
                    F.col("obj_lang").alias(f"{v}__lang"),
                    F.col("is_literal").alias(f"{v}__islit"),
                ]
            # subjects/predicates are never literals: emit NO companion
            # columns (consumers default missing ones to NULL/false;
            # joins stay lexical there — term equality ≡ lexical for
            # URIs — keeping join keys free of dead constant columns)
            continue
        f = f.filter(F.col(col) == F.lit(str(term)))
        if col == "obj" and isinstance(term, Lit):
            f = f.filter(F.col("is_literal"))
            if term.lang is not None:
                f = f.filter(
                    F.lower(F.coalesce(F.col("obj_lang"), F.lit("")))
                    == term.lang.lower()
                )
            if term.datatype is not None:
                f = f.filter(
                    F.nullif(
                        F.col("obj_datatype"), F.lit(_XSD_STRING)
                    ).eqNullSafe(F.lit(_norm_dt(term.datatype)))
                )
    return f.select(*sel) if sel else f.limit(1).select(F.lit(1).alias("_m"))


def _closure_of(base: DataFrame, s, o, mod: str) -> DataFrame:
    """The reachability frame for a repetition modifier over ``base``
    (src/dst edge columns).  `?` is the edge set itself; `+`/`*` need
    the closure — seeded frontier BFS when an endpoint is a CONSTANT
    (only that node's reachable subgraph is touched; the global
    closure would materialize every node's reachability set just to
    filter one out — quadratic on dense graphs, never acceptable at
    scale for a point lookup), global iterated squaring otherwise or
    when the BFS's depth cap trips (closure_from returns None)."""
    from ont_d2rq_spark.operators.closure import closure_from, transitive_closure

    if mod == "?":
        return base.distinct()
    bound_s = s is not None and not _is_var(s)
    bound_o = o is not None and not _is_var(o)
    if bound_s or bound_o:
        seed = str(s) if bound_s else str(o)
        seeded = closure_from(base, seed, reverse=not bound_s)
        if seeded is not None:
            return seeded
    return transitive_closure(base)


def _triple_frame_closure(tdf: DataFrame, s, pth: "PathPlus", o) -> DataFrame:
    """`pred+`/`pred*`/`pred?` over a materialized triple frame — same
    semantics as VirtualGraph._closure_frame, but the edge set and the
    zero-length node universe come from the frame itself."""
    if isinstance(pth.pred, PathGroup):
        base = bgp_over_triples(tdf, pth.pred.patterns).select(
            F.col("__cs").alias("src"), F.col("__co").alias("dst")
        )
    elif isinstance(pth.pred, NegatedSet):
        # `!p+` over the frame: the NPS evaluation (NOT-IN pred filter,
        # direction handling) provides the closure's base edge set
        base = bgp_over_triples(tdf, [("?__cs", pth.pred, "?__co")]).select(
            F.col("__cs").alias("src"), F.col("__co").alias("dst")
        )
    else:
        base = tdf.filter(F.col("pred") == F.lit(str(pth.pred))).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
    mod = getattr(pth, "mod", "+")
    df = _closure_of(base, s, o, mod)
    if mod in ("*", "?"):
        bound = next((t for t in (s, o) if t is not None and not _is_var(t)), None)
        if bound is not None:
            df = df.unionByName(
                tdf.sparkSession.createDataFrame(
                    [(str(bound), str(bound))], "src string, dst string"
                )
            ).distinct()
        else:
            nodes = (
                tdf.select(F.col("subj").alias("n"))
                .unionByName(
                    tdf.filter(~F.col("is_literal")).select(F.col("obj").alias("n"))
                )
                .distinct()
            )
            df = df.unionByName(
                nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
            ).distinct()
    sel, seen = [], {}
    for term, col in ((s, "src"), (o, "dst")):
        if term is not None and _is_var(term):
            v = _var_name(term)
            if v in seen:
                df = df.filter(F.col(col) == F.col(seen[v]))
            else:
                seen[v] = col
                sel.append(F.col(col).alias(v))
                # closure endpoints carry no literal metadata — emit NO
                # companion columns (consumers default missing ones to
                # NULL/false; joins fall back to lexical, correct for
                # the URI-only closure domain)
        elif term is not None:
            df = df.filter(F.col(col) == F.lit(str(term)))
    return df.select(*sel) if sel else df.limit(1).select(F.lit(1).alias("_m"))


def bgp_over_triples(tdf: DataFrame, patterns) -> DataFrame:
    """Generic BGP evaluation over a materialized triple frame
    (TRIPLE_SCHEMA) — filter per pattern, rename to variable columns
    (with __dt/__lang/__islit companions for objects), join on shared
    variables.  Used for named graphs whose triples are not
    mapping-backed (the vocabulary graph); the data graph keeps the
    pushdown-compiled VirtualGraph.bgp path.  Property paths (p+/p*/p?,
    alternation, path groups) and negated sets evaluate over the frame
    itself (closure via operators/closure.py)."""
    frames: list[DataFrame] = []
    for s, p, o in patterns:
        if isinstance(p, PathPlus):
            frames.append(_triple_frame_closure(tdf, s, p, o))
            continue
        if isinstance(p, NegatedSet):
            parts = []
            if p.fwd or not p.inv:
                parts.append(
                    _triple_frame_single(
                        tdf, s, None, o, pred_filter=~F.col("pred").isin(*p.fwd)
                        if p.fwd
                        else F.lit(True),
                    )
                )
            if p.inv:
                parts.append(
                    _triple_frame_single(
                        tdf, s, None, o, swap=True,
                        pred_filter=~F.col("pred").isin(*p.inv),
                    )
                )
            out_p = parts[0]
            for extra in parts[1:]:
                out_p = out_p.unionByName(extra, allowMissingColumns=True)
            frames.append(out_p)
            continue
        if isinstance(p, tuple):
            # path alternation (p1|p2): any of the listed predicates
            frames.append(
                _triple_frame_single(
                    tdf, s, None, o,
                    pred_filter=F.col("pred").isin(*[str(x) for x in p]),
                )
            )
            continue
        frames.append(_triple_frame_single(tdf, s, p, o))
    out = frames[0]
    for nxt in frames[1:]:
        out = rdf_term_join(out, nxt, "inner")
    return out


def _is_companion(col: str) -> bool:
    """Hidden typed-literal companion columns a BGP projects next to
    each variable (v__dt / v__lang / v__islit) so FILTER builtins
    (lang(), datatype()) have something to evaluate against."""
    return col.endswith(_COMPANION_SUFFIXES)


def _term_key(v: str, prefix: str = ""):
    """Canonical RDF-term metadata key for a shared-variable join: one
    deterministic string per binding folding (islit, datatype, lang) —
    '@' marks a language-tagged literal (its RDF 1.1 datatype is
    rdf:langString regardless of __dt), xsd:string folds to '' (simple
    literal ≡ xsd:string), lang tags compare case-insensitively.
    Derived from one side's columns only, so Catalyst still extracts an
    equi-join key (hash/SMJ, never a nested loop)."""
    dt = F.col(f"{prefix}{v}__dt")
    lang = F.col(f"{prefix}{v}__lang")
    islit = F.coalesce(F.col(f"{prefix}{v}__islit"), F.lit(False))
    dt_key = (
        F.when(lang.isNotNull(), F.lit("@"))
        .when(dt.isNotNull() & (dt != F.lit(_XSD_STRING)), dt)
        .otherwise(F.lit(""))
    )
    return F.concat_ws(
        "\x00", islit.cast("string"), dt_key, F.lower(F.coalesce(lang, F.lit("")))
    )


def rdf_term_join(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
    """Join two binding frames on their shared variables at RDF-TERM
    level: lexical equality plus — where BOTH sides carry the full
    companion set for a var — canonical (islit, datatype, lang)
    equality, so "42"^^xsd:string never joins "42"^^xsd:integer and a
    URI never joins a same-lexical literal.  With matching metadata
    enforced in the join condition, keeping the LEFT side's companions
    on collision is exact (no more join-order dependence).  Vars whose
    companions exist on only one side (BIND-created, projection-
    stripped) fall back to lexical equality for that var."""
    shared = [c for c in left.columns if c in right.columns and not _is_companion(c)]
    meta_vars = [
        v
        for v in shared
        if all(f"{v}{s}" in left.columns for s in _COMPANION_SUFFIXES)
        and all(f"{v}{s}" in right.columns for s in _COMPANION_SUFFIXES)
    ]
    if not meta_vars:
        right = right.drop(
            *[c for c in right.columns if _is_companion(c) and c in left.columns]
        )
        if shared:
            return left.join(right, on=shared, how=how)
        if how == "left":
            return left.join(right, F.lit(True), "left")
        return left.crossJoin(right)
    ren: dict[str, str] = {v: f"__vj_{v}" for v in shared}
    for v in meta_vars:
        for s in _COMPANION_SUFFIXES:
            ren[f"{v}{s}"] = f"__vj_{v}{s}"
    drop_dup = [
        c
        for c in right.columns
        if _is_companion(c) and c in left.columns and c not in ren
    ]
    right = right.drop(*drop_dup)
    for old, new in ren.items():
        right = right.withColumnRenamed(old, new)
    cond = F.lit(True)
    for v in shared:
        cond = cond & (F.col(v) == F.col(f"__vj_{v}"))
    for v in meta_vars:
        cond = cond & (_term_key(v) == _term_key(v, "__vj_"))
    out = left.join(right, cond, how)
    return out.drop(*[c for c in out.columns if c.startswith("__vj_")])


def bgp_join_order(patterns, pat_vars, closure_idxs=frozenset()) -> list:
    """Join order for a BGP: start from the most-bound (most-selective)
    pattern, then greedily add patterns CONNECTED to the accumulated
    variable set, most-bound first; disconnected groups fall back to
    the next most-bound seed (cross join, as before).  Ties keep the
    written order.  This is the Spark analogue of the reference's
    URIMakerRule ordering (find/URIMakerRule.java): concrete URIs and
    literals prune relations before the big joins, so intermediates
    start small; AQE then only repairs the residual mis-estimates
    rather than a structurally bad first join.

    Closure/negated-set patterns (``closure_idxs``) score 0 — their
    frames are iterative results with no stats, never a good seed."""

    def bound_count(i):
        if i in closure_idxs:
            return 0
        n = 0
        for t in patterns[i]:
            if t is None or isinstance(t, (PathPlus, NegatedSet, PathGroup, tuple)):
                continue
            if not _is_var(t):
                n += 1
        return n

    remaining = set(range(len(patterns)))
    order: list = []
    cur_vars: set = set()
    while remaining:
        connected = [i for i in remaining if cur_vars & pat_vars[i]] if order else []
        pool = connected or remaining
        nxt = max(pool, key=lambda i: (bound_count(i), -i))
        order.append(nxt)
        remaining.remove(nxt)
        cur_vars |= pat_vars[nxt]
    return order


_COMP_TOKEN = re.compile(r"\b\w+?__(?:dt|lang|islit)\b")

_STR_CONST = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")


def _mask_strings(text: str) -> tuple[str, list[str]]:
    """Replace quoted SQL string constants with \\x00N\\x00 placeholders
    so textual token rewrites can never corrupt a literal's content
    (same discipline as sparql._rewrite_builtins: a variable named
    `label` must not be rewritten inside `'see label'`)."""
    parts: list[str] = []

    def repl(m):
        parts.append(m.group(0))
        return f"\x00{len(parts) - 1}\x00"

    return _STR_CONST.sub(repl, text), parts


def _unmask_strings(text: str, parts: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: parts[int(m.group(1))], text)


def _comp_default(tok: str) -> str:
    """SQL literal an absent companion column stands for: an untyped,
    non-literal binding (false islit, NULL datatype/lang)."""
    return "false" if tok.endswith("__islit") else "CAST(NULL AS STRING)"


def _rewrite_slice_filter(f: str, compat, m, left_cols, right_cols) -> str:
    """Rewrite a merged-solution filter for a slice where the LEFT side
    is known NULL on exactly the compat vars in ``m``: a bare var token
    resolves to the adopting side's column (``__lj_<c>`` when the left
    binding is NULL, else the left column), companion tokens to that
    side's copy — or the untyped-binding default when the column is
    absent (subject-position vars carry no companions).  String
    constants are masked first so a variable name inside a quoted
    literal is never rewritten."""
    f, _strs = _mask_strings(f)
    for c in compat:
        f = re.sub(rf"\b{re.escape(c)}\b", "\x01M\x01", f)
        for suf in _COMPANION_SUFFIXES:
            tok = f"{c}{suf}"
            if c in m:
                repl = (
                    f"__lj_{tok}" if f"__lj_{tok}" in right_cols else _comp_default(tok)
                )
                f = re.sub(rf"\b{tok}\b", repl, f)
            elif tok not in left_cols:
                f = re.sub(rf"\b{tok}\b", _comp_default(tok), f)
        f = f.replace("\x01M\x01", f"__lj_{c}" if c in m else c)
    return _unmask_strings(f, _strs)


def _adopt_slice(out: DataFrame, compat, m) -> DataFrame:
    """Post-join merge for one slice: every compat var the left side
    left NULL (``m``) adopts the right side's value and typed-literal
    companions; bound slices get aligned companion columns so every
    slice's schema matches for the final unionByName.  Drops the
    ``__lj_*`` working columns."""
    for c in compat:
        adopted = c in m
        if adopted:
            out = out.withColumn(c, F.col("__lj_" + c))
        for suf in _COMPANION_SUFFIXES:
            rc, lc = f"__lj_{c}{suf}", f"{c}{suf}"
            if rc not in out.columns:
                continue
            if adopted:
                out = out.withColumn(lc, F.col(rc))
            elif lc not in out.columns:
                out = out.withColumn(
                    lc,
                    F.lit(False).cast("boolean")
                    if suf == "__islit"
                    else F.lit(None).cast("string"),
                )
    return out.drop(*[c for c in out.columns if c.startswith("__lj_")])


def _masked_compat_join(
    left: DataFrame,
    right: DataFrame,
    shared: list,
    compat: list,
    filters,
    how: str,
) -> DataFrame:
    """Hash-joinable SPARQL compatibility join for the dominant shape —
    the RIGHT side always binds the compat vars (an OPTIONAL body BGP),
    only the LEFT may leave them unbound.

    Strategy (r6): move the 2^k expansion to the SMALL side.  The right
    frame cross-joins a 2^k-row mask frame (one row per subset m of the
    compat vars); copy m carries sentinel join keys __cjk_c = SENTINEL
    for c in m, else the right value.  The left joins ONCE with keys
    coalesce(left.c, SENTINEL) == __cjk_c: a left row whose null-set is
    exactly M matches exactly the m == M copies, which is precisely the
    slice-decomposition semantics (unbound is compatible with every
    binding, bound vars need equality) — but the BIG left is streamed
    once through one hash join, never sliced, never re-executed, and
    never checkpointed.  When the expanded right is broadcast-sized the
    whole compatibility join is shuffle-free.

    History: round-5 sliced the LEFT 2^k ways and unioned; the soak
    shape then re-executed its 25M-row 7-join left per slice (measured
    42.4/28.2 s medians), and checkpointing the left instead was WORSE
    (55.5/64.5 s — wide-frame materialization).  The key-expansion join
    replaces both.

    Skew note: every left row with all compat vars NULL shares one
    sentinel key component; with a broadcast right that is moot (no
    shuffle), and for a shuffled join AQE's skew-join splitting covers
    it.  Sentinel collision with real data would need a lexical value
    containing NUL bytes — impossible for minted URIs and

    vanishingly unlikely for literals.

    ``right`` arrives with its shared columns (and compat companions)
    already renamed to __lj_*."""
    from itertools import combinations

    right_cols = set(right.columns)
    left_cols = set(left.columns)
    sent = "\x00\x00__sparql_adopt__\x00"
    # expand via explode of a LITERAL mask array, not a crossJoin with
    # a local mask frame: a LogicalRDD has no stats, and an
    # unknown-size subtree would disqualify the expanded right from the
    # broadcast strategy — the entire point of putting the 2^k factor
    # on the small side
    mask_structs = []
    for k in range(len(compat) + 1):
        for null_vars in combinations(compat, k):
            m = set(null_vars)
            mask_structs.append(
                F.struct(
                    *[
                        F.lit(c in m).alias(f"m_{i}")
                        for i, c in enumerate(compat)
                    ],
                    F.lit(",".join(sorted(m)) or "-").alias("tag"),
                )
            )
    rx = right.withColumn("__cj", F.explode(F.array(*mask_structs)))
    rx = rx.withColumn("__cj_tag", F.col("__cj.tag"))
    for i, c in enumerate(compat):
        # keys compare as STRINGS: a non-string compat column (the
        # internal `_m` zero-var marker is an int) must not force an
        # ANSI cast of the sentinel
        rx = rx.withColumn(
            f"__cjk_{c}",
            F.when(F.col(f"__cj.m_{i}"), F.lit(sent)).otherwise(
                F.col("__lj_" + c).cast("string")
            ),
        )
    rx = rx.drop("__cj")
    cond = F.lit(True)
    for c in shared:
        if c in compat:
            cond = cond & (
                F.coalesce(F.col(c).cast("string"), F.lit(sent))
                == F.col(f"__cjk_{c}")
            )
        else:
            cond = cond & (F.col(c) == F.col("__lj_" + c))
    if filters:
        # the merged binding is KNOWN per right copy: dispatch the
        # per-m rewritten filter on the copy tag (Catalyst still
        # extracts the equi-keys; the dispatch is a post-join residual)
        disp = F.lit(False)
        for k in range(len(compat) + 1):
            for null_vars in combinations(compat, k):
                m = set(null_vars)
                tag = ",".join(sorted(m)) or "-"
                fm = F.lit(True)
                for f in filters:
                    fm = fm & F.expr(
                        _rewrite_slice_filter(f, compat, m, left_cols, right_cols)
                    )
                disp = disp | ((F.col("__cj_tag") == tag) & fm)
        cond = cond & disp
    out = left.join(rx, cond, how)
    # uniform post-join merge: a left-NULL compat var adopts the right
    # value and companions (companions computed BEFORE c is overwritten)
    for c in compat:
        for suf in _COMPANION_SUFFIXES:
            rc, lc = f"__lj_{c}{suf}", f"{c}{suf}"
            if rc not in out.columns:
                continue
            left_ref = (
                F.col(lc)
                if lc in out.columns
                else (
                    F.lit(False).cast("boolean")
                    if suf == "__islit"
                    else F.lit(None).cast("string")
                )
            )
            out = out.withColumn(
                lc, F.when(F.col(c).isNull(), F.col(rc)).otherwise(left_ref)
            )
        out = out.withColumn(c, F.coalesce(F.col(c), F.col("__lj_" + c)))
    drop = [c for c in out.columns if c.startswith(("__lj_", "__cjk_", "__cj_m_"))]
    return out.drop(*drop, "__cj_tag")


def _masked_compat_join_sym(
    left: DataFrame,
    right: DataFrame,
    shared: list,
    compat: list,
    left_nullable: list,
    right_nullable: list,
    filters,
    how: str,
) -> DataFrame:
    """Symmetric hash-joinable decomposition of the SPARQL
    compatibility join for the shapes the one-sided decomposition
    excludes: the RIGHT side (a subquery / nested group / GRAPH-union
    projection) can itself leave compat vars unbound.  BOTH sides
    partition disjointly by which of their nullable compat vars are
    actually NULL (2^|L| left x 2^|R| right slices); each slice PAIR
    joins with plain equality on the shared vars bound on BOTH sides —
    no condition at all on a var either side leaves NULL, since
    unbound-vs-anything is compatible — and the union of the pairwise
    inner joins is exactly the compatibility join.  For LeftJoin
    semantics the left rows with no compatible partner are recovered
    with a hash left-anti join on a checkpoint-stable row id.  At scale
    every join stays hash-partitioned; only a pair with NO bound shared
    var (usually tiny) can still pay a cross join.  This replaces the
    BroadcastNestedLoopJoin fallback Catalyst planned for the
    isNull-or-equal condition (round-5 verdict item #1).

    ``right`` arrives with its shared columns (and compat companions)
    already renamed to ``__lj_*``."""
    from itertools import combinations

    right_cols = set(right.columns)
    left_cols = set(left.columns)
    preserve = how == "left"
    n_pairs = (2 ** len(left_nullable)) * (2 ** len(right_nullable))
    # each subtree re-executes once per slice pair (Spark does not share
    # subtrees across union branches) — pay each side once.  The row id
    # used for outer reconstruction is minted BEFORE the checkpoint so
    # it is stable across re-evaluations of the cached partitions.
    if preserve:
        left = left.withColumn("__cj_id", F.monotonically_increasing_id())
    if n_pairs > 1 or preserve:
        left = left.localCheckpoint(eager=False)
        right = right.localCheckpoint(eager=False)
    outs: list[DataFrame] = []
    for k in range(len(left_nullable) + 1):
        for m_vars in combinations(left_nullable, k):
            m = set(m_vars)
            sl = left
            for c in left_nullable:
                sl = sl.filter(F.col(c).isNull() if c in m else F.col(c).isNotNull())
            for j in range(len(right_nullable) + 1):
                for t_vars in combinations(right_nullable, j):
                    t = set(t_vars)
                    sr = right
                    for c in right_nullable:
                        rc = F.col("__lj_" + c)
                        sr = sr.filter(rc.isNull() if c in t else rc.isNotNull())
                    cond = F.lit(True)
                    for c in shared:
                        if c not in m and c not in t:
                            cond = cond & (F.col(c) == F.col("__lj_" + c))
                    for f in filters:
                        # the merged binding is KNOWN per pair: left's
                        # value unless left-NULL, then right's (which is
                        # itself NULL in the c-in-t slices — an unbound
                        # var in a FILTER evaluates to NULL → false,
                        # matching the coalesce() of the fallback path)
                        cond = cond & F.expr(
                            _rewrite_slice_filter(f, compat, m, left_cols, right_cols)
                        )
                    outs.append(_adopt_slice(sl.join(sr, cond, "inner"), compat, m))
    matched = reduce(lambda a, b: a.unionByName(b), outs)
    if not preserve:
        return matched
    # LeftJoin: left rows with no compatible partner survive with the
    # right-side vars unbound.  Checkpoint the matched set so the union
    # and the anti-join evaluate the pairwise joins once, not twice.
    matched = matched.localCheckpoint(eager=False)
    rest = left.join(matched.select("__cj_id"), "__cj_id", "left_anti")
    for fld in right.schema.fields:
        name = fld.name[len("__lj_") :] if fld.name.startswith("__lj_") else fld.name
        if name not in rest.columns:
            rest = rest.withColumn(name, F.lit(None).cast(fld.dataType))
    return matched.unionByName(rest, allowMissingColumns=True).drop("__cj_id")


def optional_join(
    left: DataFrame,
    right: DataFrame,
    filters=(),
    maybe_unbound=frozenset(),
    how: str = "left",
    right_maybe=frozenset(),
) -> DataFrame:
    """SPARQL LeftJoin(Ω1, Ω2, expr): a right solution joins a left one
    when they are compatible on the shared variables AND every filter
    expression holds over the MERGED row; left solutions with no such
    match survive with the right-side variables unbound.  This is the
    scoped evaluation of a FILTER written inside an OPTIONAL group —
    the filter may reference variables from either side, and a failing
    filter un-binds the optional part instead of dropping the row
    (the classic leftjoin-vs-filter distinction).

    ``maybe_unbound`` names LEFT-side variables that can be NULL
    (introduced by an earlier OPTIONAL / UNION branch / VALUES UNDEF);
    ``right_maybe`` names RIGHT-side variables that can be NULL (a
    subquery or nested group projecting its own optional vars).  For
    those, SPARQL compatibility treats unbound-vs-bound as compatible,
    while fully-bound shared vars keep the plain (hash-joinable)
    equality.  Callers track both sets so the common all-bound case
    never pays any compatibility price.

    When the nullable side is ONLY the left (the dominant case — the
    right side of an OPTIONAL is a BGP that always binds its vars),
    the join runs as ONE hash join with sentinel key expansion on the
    SMALL side (_masked_compat_join): the right side is replicated 2^k
    ways (k ≤ 3 compat vars) with sentinel join keys, so a left row
    whose null-set is M matches exactly the m == M copy — the big left
    streams once, unsliced, and the join broadcasts when the expanded
    right is small.  Right-nullable compat vars (or > 3 of them) take
    the symmetric slice decomposition.

    With no filters and no maybe-unbound shared vars this degrades to
    the plain shared-variable left join (constant-true condition when
    the domains are disjoint, which preserves left rows against an
    empty right side)."""
    shared = [c for c in left.columns if c in right.columns and not _is_companion(c)]
    compat = [c for c in shared if c in maybe_unbound or c in right_maybe]
    right = right.drop(
        *[
            c
            for c in right.columns
            if _is_companion(c) and c in left.columns and c[: c.rfind("__")] not in compat
        ]
    )
    # companions referenced by a filter but produced by neither side
    # default to NULL / false (untyped binding); scan with string
    # constants masked so a literal like 'x__dt' is never mistaken
    # for a companion reference
    for tok in {t for f in filters for t in _COMP_TOKEN.findall(_mask_strings(f)[0])}:
        if tok not in left.columns and tok not in right.columns:
            right = right.withColumn(
                tok,
                F.lit(False) if tok.endswith("__islit") else F.lit(None).cast("string"),
            )
    if not filters and not compat:
        if shared:
            return left.join(right, on=shared, how=how)
        if how == "left":
            return left.join(right, F.lit(True), "left")
        return left.crossJoin(right)
    ren = {c: "__lj_" + c for c in shared}
    for c in list(right.columns):
        base = c[: c.rfind("__")] if _is_companion(c) else None
        if c in ren:
            right = right.withColumnRenamed(c, ren[c])
        elif base in compat:
            right = right.withColumnRenamed(c, "__lj_" + c)
    left_nullable = [c for c in compat if c in maybe_unbound]
    right_nullable = [c for c in compat if c in right_maybe]
    if compat and len(compat) <= 3 and not right_nullable:
        return _masked_compat_join(left, right, shared, compat, filters, how)
    if compat and len(left_nullable) + len(right_nullable) <= 4:
        return _masked_compat_join_sym(
            left, right, shared, compat, left_nullable, right_nullable, filters, how
        )
    # >4 nullable compat vars: 2^k slice blowup would cost more than the
    # nested-loop join it avoids — documented cap, not a plan accident
    cond = F.lit(True)
    for c, rc in ren.items():
        if c in compat:
            # either side unbound → compatible (right can be NULL when
            # it is a subquery projection with its own OPTIONAL vars)
            cond = cond & (
                F.col(c).isNull() | F.col(rc).isNull() | (F.col(c) == F.col(rc))
            )
        else:
            cond = cond & (F.col(c) == F.col(rc))
    # group filters evaluate over the MERGED solution (SPARQL LeftJoin
    # expr): a compat var reference inside the condition means the
    # adopted value when the left side is unbound — rewrite bare var
    # tokens to coalesce(left, right) and companion tokens to the
    # adopting side's copy.  Sentinels keep the three rewrites from
    # corrupting each other's emitted text.
    right_cols = set(right.columns)
    left_cols = set(left.columns)
    for f in filters:
        # string constants are masked first: the \b-token rewrites must
        # never touch a variable name occurring INSIDE a quoted literal
        # (FILTER(?note = "see label") with compat var `label`)
        f, _strs = _mask_strings(f)
        for c in compat:
            f = re.sub(rf"\b{re.escape(c)}\b", "\x01M\x01", f)  # bare var only
            for suf in _COMPANION_SUFFIXES:
                tok = f"{c}{suf}"
                if f"__lj_{tok}" in right_cols:
                    # the merged companion: adopted side's copy when the
                    # left binding is NULL.  Either side may LACK the
                    # column (subject-position vars carry no companions
                    # since r5) — dangling references become the
                    # untyped-binding default instead of an unresolvable
                    # column
                    lref = tok if tok in left_cols else _comp_default(tok)
                    f = re.sub(
                        rf"\b{tok}\b",
                        f"(CASE WHEN \x01L\x01 IS NULL THEN __lj_{tok} ELSE {lref} END)",
                        f,
                    )
                elif tok not in left_cols:
                    f = re.sub(rf"\b{tok}\b", _comp_default(tok), f)
            f = f.replace("\x01M\x01", f"coalesce({c}, __lj_{c})")
            f = f.replace("\x01L\x01", c)
        cond = cond & F.expr(_unmask_strings(f, _strs))
    out = left.join(right, cond, how)
    # merge compat vars: an unbound left binding adopts the right value
    # (and its typed-literal companions)
    for c in compat:
        for suf in _COMPANION_SUFFIXES:
            lc, rc = f"{c}{suf}", f"__lj_{c}{suf}"
            if rc in out.columns:
                merged = (
                    F.when(F.col(c).isNull(), F.col(rc)).otherwise(F.col(lc))
                    if lc in out.columns
                    else F.when(F.col(c).isNull(), F.col(rc))
                )
                out = out.withColumn(lc, merged)
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(ren[c])))
    return out.drop(*[c for c in out.columns if c.startswith("__lj_")])


class VirtualGraph:
    def __init__(
        self,
        mapping: Mapping,
        spark: SparkSession,
        extra_tables=None,
        use_broadcast_hints: bool = True,
    ):
        self.mapping = mapping
        self.spark = spark
        self.compiler = MappingCompiler(
            mapping, spark, extra_tables, use_broadcast_hints=use_broadcast_hints
        )
        self.bridges: list[CompiledBridge] = self.compiler.compile()
        self._cached: list[DataFrame] = []
        # named graphs (SPARQL GRAPH clause): the reference serves the
        # data and the derived OWL vocabulary as separable graphs
        # (map/impl/schema/*, SURVEY §2.1 S8)
        self.data_graph_iri = "urn:x-d2rq:graph:data"
        self.vocabulary_graph_iri = "urn:x-d2rq:graph:vocabulary"

    def graph_names(self) -> list[str]:
        return [self.data_graph_iri, self.vocabulary_graph_iri]

    def graph_scoped_bgp(self, graph_iri: str, patterns) -> DataFrame:
        """BGP against one named graph.  The data graph takes the
        mapping-compiled path (pushdown into the source tables); the
        vocabulary graph — tiny, driver-built — evaluates over its
        literal triple frame.  An unknown graph name yields the empty
        solution set."""
        if graph_iri == self.data_graph_iri:
            return self.bgp(patterns)
        return bgp_over_triples(self.graph_triples(graph_iri), patterns)

    def graph_triples(self, graph_iri: str) -> DataFrame:
        """One named graph as a TRIPLE_SCHEMA frame (the SPARQL
        FROM-clause merge path: a multi-graph default graph unions
        these).  Unknown graph name → empty frame (SPARQL: a dataset
        clause naming an absent graph contributes no triples)."""
        if graph_iri == self.data_graph_iri:
            return self.triples()
        if graph_iri == self.vocabulary_graph_iri:
            from ont_d2rq_spark.schema_graph import schema_triples

            return schema_triples(self.mapping, self.spark)
        return self.spark.createDataFrame([], TRIPLE_SCHEMA)

    # ------------------------------------------------------------------
    # node binding (reference: TripleRelation.selectTriple + NodeMaker
    # unification, values/*.valueExpression — SURVEY §3 E1 step 2)
    # ------------------------------------------------------------------
    def _literal_meta(self, cb: CompiledBridge, spec: NodeSpec):
        """Effective (is_literal, datatype, lang) a spec produces —
        mirrors _node_exprs' datatype inference for typed unification."""
        if spec.kind in ("uri_pattern", "uri_column", "uri_expr", "bnode"):
            return False, None, None
        if spec.kind == "constant":
            return spec.is_literal, spec.datatype, spec.lang
        if spec.kind == "literal_column":
            if spec.datatype:
                dt = spec.datatype
            elif spec.lang:
                dt = None
            else:
                from ont_d2rq_spark.functions.lexical import datatype_for

                dt = datatype_for(
                    self.compiler.column_type(
                        _qualify(spec.column, cb.base_alias), cb.aliases
                    )
                )
            return True, dt, spec.lang
        return True, spec.datatype, spec.lang  # literal_pattern / literal_expr

    def _bind(self, cb: CompiledBridge, spec: NodeSpec, value: str, out_col: str):
        """→ (constraints {qualified col: typed const}, post_filters [Column]).
        Raises _Prune when the relation cannot produce `value`."""
        constraints: dict = {}
        post: list = []
        # typed-literal unification (nodes/TypedNodeMaker.java): a Lit
        # carrying datatype/lang prunes relations whose literal type
        # cannot match, BEFORE any lexical inversion
        want_dt = getattr(value, "datatype", None)
        want_lang = getattr(value, "lang", None)
        if want_dt is not None or want_lang is not None:
            is_lit, eff_dt, eff_lang = self._literal_meta(cb, spec)
            if not is_lit:
                raise _Prune()
            if want_lang is not None and (eff_lang or "").lower() != want_lang.lower():
                raise _Prune()
            if want_dt is not None and _norm_dt(eff_dt) != _norm_dt(want_dt):
                raise _Prune()
        # value-decorator pruning (values/ValueDecorator.java, P4)
        if spec.value_max_length is not None and len(value) > spec.value_max_length:
            raise _Prune()
        if spec.value_contains and spec.value_contains not in value:
            raise _Prune()
        if spec.value_regex and not re.search(spec.value_regex, value):
            raise _Prune()

        if spec.kind == "constant":
            if spec.constant != value:
                raise _Prune()
            return constraints, post
        if spec.kind in ("uri_pattern", "literal_pattern"):
            inverted = spec.pattern.invert(value)
            if inverted is None:
                raise _Prune()
            for qcol, raw in inverted.items():
                q = _qualify(qcol, cb.base_alias)
                try:
                    constraints[q] = coerce_constant(
                        raw, self.compiler.column_type(q, cb.aliases)
                    )
                except (ValueError, ArithmeticError):
                    raise _Prune()
            return constraints, post
        if spec.kind in ("uri_column", "literal_column"):
            raw = value
            if spec.translate is not None:
                raw = spec.translate.to_db_value(value)
                if raw is None:
                    raise _Prune()
            q = _qualify(spec.column, cb.base_alias)
            try:
                constraints[q] = coerce_constant(
                    raw, self.compiler.column_type(q, cb.aliases)
                )
            except (ValueError, ArithmeticError):
                raise _Prune()
            return constraints, post
        if spec.kind == "bnode":
            parts = value.split("@@")
            if parts[0] != f"_:{spec.bnode_name}" or len(parts) != 1 + len(
                spec.bnode_columns
            ):
                raise _Prune()
            for qcol, raw in zip(spec.bnode_columns, parts[1:]):
                q = _qualify(qcol, cb.base_alias)
                try:
                    constraints[q] = coerce_constant(
                        raw, self.compiler.column_type(q, cb.aliases)
                    )
                except (ValueError, ArithmeticError):
                    raise _Prune()
            return constraints, post
        # expression makers are not invertible → post-mint equality filter
        post.append(F.col(out_col) == F.lit(value))
        return constraints, post

    # ------------------------------------------------------------------
    def find(
        self,
        s: Optional[str] = None,
        p: Optional[str] = None,
        o: Optional[str] = None,
        o_datatype: Optional[str] = None,
        o_lang: Optional[str] = None,
    ) -> DataFrame:
        """Triple-pattern lookup: None = wildcard.  One Catalyst job.
        ``o_datatype``/``o_lang`` make the bound object a TYPED literal
        (find(o='42', o_datatype=XSD+'integer') excludes bridges whose
        literals are strings — TypedNodeMaker unification)."""
        if o is not None and (o_datatype is not None or o_lang is not None):
            o = Lit(o, datatype=o_datatype, lang=o_lang)
        frames = []
        for cb in self.bridges:
            constraints: dict = {}
            post: list = []
            try:
                for spec, val, col in (
                    (cb.subject, s, "subj"),
                    (cb.predicate, p, "pred"),
                    (cb.object, o, "obj"),
                ):
                    if val is not None:
                        c, f = self._bind(cb, spec, val, col)
                        constraints.update(c)
                        post.extend(f)
            except _Prune:
                continue
            # d2rq:limitInverse (SURVEY §2.6 O2): when the pattern is
            # queried in the inverse direction (object bound, subject
            # free) the inverse limit replaces d2rq:limit
            if (
                cb.bridge is not None
                and cb.bridge.limit_inverse is not None
                and o is not None
                and s is None
            ):
                import dataclasses

                cb = dataclasses.replace(cb, limit=cb.bridge.limit_inverse)
            frames.append(self.compiler.bridge_df(cb, constraints, post))
        # d2rq:serveVocabulary: the schema graph answers find() too
        # (ont-d2rq unions the OWL vocabulary with the data graph)
        if self.mapping.configuration.serve_vocabulary:
            from ont_d2rq_spark.schema_graph import schema_rows

            rows = [
                r
                for r in schema_rows(self.mapping)
                if (s is None or r[0] == s)
                and (p is None or r[1] == p)
                and (o is None or r[2] == o)
            ]
            if rows:
                frames.append(self.spark.createDataFrame(rows, TRIPLE_SCHEMA))
        if not frames:
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        return reduce(lambda a, b: a.unionByName(b), frames)

    # ------------------------------------------------------------------
    # join-compatibility pruning (find/URIMakerRule.java): when two
    # patterns share a variable, candidate relations whose node makers
    # can NEVER mint the same node are dropped at plan time — the scan
    # for ?c ex:inNation ?n never touches the supplier table when
    # another pattern pins ?c to customer URIs.
    # ------------------------------------------------------------------
    _LIT_KINDS = frozenset({"literal_column", "literal_pattern", "literal_expr"})

    def _is_literal_spec(self, spec: NodeSpec) -> bool:
        return spec.kind in self._LIT_KINDS or (
            spec.kind == "constant" and spec.is_literal
        )

    def _uri_prefix(self, spec: NodeSpec):
        """(fixed prefix, is_exact) of every URI the spec mints, or None
        when opaque (uri_column / uri_expr / translated values)."""
        if spec.kind == "constant":
            return spec.constant, True
        if spec.kind == "uri_pattern" and spec.translate is None:
            p0 = spec.pattern.parts[0]
            return (p0 if isinstance(p0, str) else ""), spec.pattern.is_constant
        return None

    def _join_compatible(self, a: NodeSpec, cb_a, b: NodeSpec, cb_b) -> bool:
        """Can specs a and b ever produce the SAME node?  False only
        when provably disjoint (prefix mismatch, literal vs URI, typed
        literal disagreement, different bnode relations)."""
        a_lit, b_lit = self._is_literal_spec(a), self._is_literal_spec(b)
        if a_lit != b_lit:
            return False
        if a_lit:
            _, dt_a, la = self._literal_meta(cb_a, a)
            _, dt_b, lb = self._literal_meta(cb_b, b)
            return (la or "").lower() == (lb or "").lower() and _norm_dt(
                dt_a
            ) == _norm_dt(dt_b)
        a_bn, b_bn = a.kind == "bnode", b.kind == "bnode"
        if a_bn or b_bn:
            if a_bn and b_bn:
                return a.bnode_name == b.bnode_name
            pref = self._uri_prefix(b if a_bn else a)
            return pref is None or pref[0].startswith("_:")
        pa, pb = self._uri_prefix(a), self._uri_prefix(b)
        if pa is None or pb is None:
            return True
        (sa, ea), (sb, eb) = pa, pb
        if ea and eb:
            return sa == sb
        if ea:
            return sa.startswith(sb)
        if eb:
            return sb.startswith(sa)
        shorter, longer = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
        return longer.startswith(shorter)

    def var_spec_domains(self, patterns) -> dict:
        """Per-variable candidate NodeSpec domain of a pattern list —
        {var: [(spec, cb), ...]} for every var whose domain is provably
        bounded.  This is URIMakerRule pruning lifted ACROSS group
        boundaries: an OPTIONAL/MINUS/UNION body that shares a var with
        the outer group can drop candidate bridges that could never
        mint a node the outer group produces (the soak shape's
        `OPTIONAL { ?r ex:name ?rn }` keeps only the region name bridge
        once the outer closure pins ?r to region URIs — a 3.9M-row
        union becomes 5 broadcastable rows).

        Closure patterns (`p+`) bound their endpoints via the base
        pattern's subject/object specs (a path always starts at a base
        subject and ends at a base object); `p*`/`p?` endpoints are
        UNBOUNDED (zero-length identity ranges over every graph node)
        and excluded.  A var is mapped only when every pattern binding
        it yields a candidate list; the tightest list wins."""
        meta: dict[int, list] = {}
        domains: dict[str, list] = {}
        unknown: set = set()
        for idx, (s, p, o) in enumerate(patterns):
            if isinstance(p, PathPlus):
                if getattr(p, "mod", "+") != "+":
                    unknown |= {_var_name(t) for t in (s, o) if t is not None and _is_var(t)}
                    continue
                base = (
                    p.pred.patterns
                    if isinstance(p.pred, PathGroup)
                    else [("?__cs", p.pred, "?__co")]
                )
                sub = self.var_spec_domains(base)
                for term, end in ((s, "__cs"), (o, "__co")):
                    if term is not None and _is_var(term):
                        v = _var_name(term)
                        if end in sub:
                            domains.setdefault(v, sub[end])
                        else:
                            unknown.add(v)
                continue
            p_options = p if isinstance(p, tuple) else (p,)
            if isinstance(p, NegatedSet):
                unknown |= {_var_name(t) for t in (s, o) if t is not None and _is_var(t)}
                continue
            cands = []
            for popt in p_options:
                for cb in self.bridges:
                    try:
                        for spec, term, col in (
                            (cb.subject, s, "subj"),
                            (cb.predicate, popt, "pred"),
                            (cb.object, o, "obj"),
                        ):
                            if term is not None and not _is_var(term):
                                self._bind(cb, spec, term, col)
                    except _Prune:
                        continue
                    varspecs = {}
                    for spec, term in (
                        (cb.subject, s),
                        (cb.predicate, popt),
                        (cb.object, o),
                    ):
                        if term is not None and _is_var(term):
                            varspecs.setdefault(_var_name(term), spec)
                    cands.append({"cb": cb, "varspecs": varspecs})
            meta[idx] = cands
        self._prune_join_incompatible(meta)
        for cands in meta.values():
            per_var: dict[str, list] = {}
            for c in cands:
                for v, spec in c["varspecs"].items():
                    per_var.setdefault(v, []).append((spec, c["cb"]))
            for v, lst in per_var.items():
                if v not in domains or len(lst) < len(domains[v]):
                    domains[v] = lst
        return {v: lst for v, lst in domains.items() if v not in unknown and lst}

    def _prune_join_incompatible(self, meta: dict) -> None:
        """Fixpoint: a candidate survives only if, for every variable it
        shares with another pattern, SOME candidate of that pattern is
        join-compatible on that variable."""
        var_home: dict[str, set] = {}
        for idx, cands in meta.items():
            for c in cands:
                for v in c["varspecs"]:
                    var_home.setdefault(v, set()).add(idx)
        changed = True
        while changed:
            changed = False
            for idx in list(meta):
                keep = []
                for c in meta[idx]:
                    ok = True
                    for v, spec in c["varspecs"].items():
                        for j in var_home.get(v, ()):
                            if j == idx or not meta[j]:
                                continue
                            if not any(
                                self._join_compatible(spec, c["cb"], o["varspecs"][v], o["cb"])
                                for o in meta[j]
                                if v in o["varspecs"]
                            ):
                                ok = False
                                break
                        if not ok:
                            break
                    if ok:
                        keep.append(c)
                if len(keep) != len(meta[idx]):
                    meta[idx] = keep
                    changed = True

    def _pattern_frame(self, cb, constraints, post, s, p, o) -> DataFrame:
        """One bridge's contribution to a pattern: variable columns +
        typed-literal companions projected from the triple frame."""
        df = self.compiler.bridge_df(cb, constraints, post)
        sel, seen = [], {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if term is not None and _is_var(term):
                v = _var_name(term)
                if v in seen:  # repeated var within one pattern
                    df = df.filter(F.col(col) == F.col(seen[v]))
                else:
                    seen[v] = col
                    sel.append(F.col(col).alias(v))
                    # typed-literal companions: FILTER builtins
                    # (lang/datatype) evaluate against these.  Only
                    # OBJECT positions can be literals — subject/pred
                    # vars emit no companions (consumers default the
                    # missing columns to NULL/false, and join keys stay
                    # free of dead constant metadata)
                    if col == "obj":
                        sel += [
                            F.col("obj_datatype").alias(f"{v}__dt"),
                            F.col("obj_lang").alias(f"{v}__lang"),
                            F.col("is_literal").alias(f"{v}__islit"),
                        ]
        return df.select(*sel) if sel else df.limit(1).select(F.lit(1).alias("_m"))

    def _closure_frame(self, s, pth: "PathPlus", o) -> DataFrame:
        """`pred+`/`pred*`/`pred?` pattern → the predicate's reachability
        frame with the s/o terms applied.  Literal objects appear only as
        terminal nodes (they never match a subject); their datatype/lang
        companions are not carried through the closure."""
        if isinstance(pth.pred, PathGroup):
            base = self.bgp(pth.pred.patterns).select(
                F.col("__cs").alias("src"), F.col("__co").alias("dst")
            )
        else:
            base = self.bgp([("?__cs", pth.pred, "?__co")]).select(
                F.col("__cs").alias("src"), F.col("__co").alias("dst")
            )
        mod = getattr(pth, "mod", "+")
        df = _closure_of(base, s, o, mod)
        if mod in ("*", "?"):
            # zero-length path: a bound end prunes the identity to that
            # single term; var-var needs the graph's full node set (ARQ
            # semantics) — one dump-shaped scan, distinct on node
            bound = next(
                (t for t in (s, o) if t is not None and not _is_var(t)), None
            )
            if bound is not None:
                ident = self.spark.createDataFrame(
                    [(str(bound), str(bound))], "src string, dst string"
                )
            else:
                t = self.triples(fuse=True)
                nodes = (
                    t.select(F.col("subj").alias("n"))
                    .unionByName(
                        t.filter(~F.col("is_literal")).select(
                            F.col("obj").alias("n")
                        )
                    )
                    .distinct()
                )
                ident = nodes.select(
                    F.col("n").alias("src"), F.col("n").alias("dst")
                )
            df = df.unionByName(ident).distinct()
        sel, seen = [], {}
        for term, col in ((s, "src"), (o, "dst")):
            if term is not None and _is_var(term):
                v = _var_name(term)
                if v in seen:
                    df = df.filter(F.col(col) == F.col(seen[v]))
                else:
                    seen[v] = col
                    sel.append(F.col(col).alias(v))
                    # closure endpoints: no literal metadata carried
                    # through the closure — no companion columns
            elif term is not None:
                df = df.filter(F.col(col) == F.lit(str(term)))
        return df.select(*sel) if sel else df.limit(1).select(F.lit(1).alias("_m"))

    def bgp(
        self,
        patterns: Sequence[tuple],
        filters: Optional[Sequence[str]] = None,
        optional: Optional[Sequence[Sequence[tuple]]] = None,
        outer_specs: Optional[dict] = None,
    ) -> DataFrame:
        """Basic graph pattern → joined DataFrame of variable bindings.

        Each pattern is (s, p, o); terms are constants or '?var'/Var.
        Shared variables join (reference: NodeRelationJoiner); result has
        one string column per variable (node lexical value).

        ``filters``: Spark-SQL boolean expressions over variable names —
        the pushable subset of SPARQL FILTER (Catalyst pushes them into
        the joins/scans where possible; the reference translates the
        same subset to SQL via TransformExprToSQLApplyer).
        ``optional``: a list of OPTIONAL groups — each a pattern list,
        or a (patterns, filters) tuple whose filters are scoped to the
        group (evaluated inside the LeftJoin condition, SPARQL
        leftjoin semantics) — left-joined on the shared variables.
        NOTE: this parameter serves the direct-API/find surface only;
        the SPARQL front-end applies OPTIONALs itself via the
        recursive sparql._eval_where (which also handles nullable
        RIGHT sides via right_maybe — impossible here, where every
        group is a plain always-binding pattern list)."""
        # negated property sets → internal predicate variable + NOT IN
        # post-filter (inverse-only sets swap subject/object); the
        # internal column is dropped before returning, so the rewrite
        # is invisible to callers and composes inside OPTIONAL/EXISTS
        neg_filters: list[tuple[str, tuple]] = []
        rewritten: list[tuple] = []
        for s, p, o in patterns:
            if isinstance(p, NegatedSet) and not (p.fwd and p.inv):
                name = f"__np{len(neg_filters)}"
                if p.inv:
                    s, o = o, s
                rewritten.append((s, f"?{name}", o))
                neg_filters.append((name, p.inv or p.fwd))
            else:
                rewritten.append((s, p, o))
        patterns = rewritten
        closure_frames: dict[int, DataFrame] = {}
        meta: dict[int, list] = {}
        for idx, (s, p, o) in enumerate(patterns):
            if isinstance(p, NegatedSet):
                # mixed forward/inverse set !(p|^q): a forward edge with
                # pred ∉ fwd OR an inverse edge with pred ∉ inv — the
                # union of the two single-direction evaluations (each
                # matching a DIFFERENT edge, so union-all is the correct
                # solution multiset)
                fa = self.bgp([(s, NegatedSet(fwd=p.fwd), o)])
                fb = self.bgp([(s, NegatedSet(inv=p.inv), o)])
                closure_frames[idx] = fa.unionByName(fb, allowMissingColumns=True)
                continue
            if isinstance(p, PathPlus):
                closure_frames[idx] = self._closure_frame(s, p, o)
                continue
            # tuple predicate = SPARQL path alternation (p1|p2): a bridge
            # matches if it can produce ANY of the alternatives
            p_options = p if isinstance(p, tuple) else (p,)
            cands = []
            for popt in p_options:
                for cb in self.bridges:
                    constraints: dict = {}
                    post: list = []
                    try:
                        for spec, term, col in (
                            (cb.subject, s, "subj"),
                            (cb.predicate, popt, "pred"),
                            (cb.object, o, "obj"),
                        ):
                            if term is not None and not _is_var(term):
                                c, f = self._bind(cb, spec, term, col)
                                constraints.update(c)
                                post.extend(f)
                    except _Prune:
                        continue
                    varspecs = {}
                    for spec, term in (
                        (cb.subject, s),
                        (cb.predicate, popt),
                        (cb.object, o),
                    ):
                        if term is not None and _is_var(term):
                            varspecs.setdefault(_var_name(term), spec)
                    cands.append(
                        {
                            "cb": cb,
                            "constraints": constraints,
                            "post": post,
                            "popt": popt,
                            "varspecs": varspecs,
                        }
                    )
            meta[idx] = cands
        if outer_specs:
            # cross-group URIMakerRule (var_spec_domains): a candidate
            # whose spec for a shared var can never mint a node the
            # OUTER group produces is dead — the join that follows this
            # group would drop every row it contributes.  Pruning here
            # turns e.g. an all-name-bridges union into the one bridge
            # the outer var can reach (and thereby into a broadcast).
            for idx, cands in meta.items():
                meta[idx] = [
                    c
                    for c in cands
                    if all(
                        any(
                            self._join_compatible(c["varspecs"][v], c["cb"], ospec, ocb)
                            for ospec, ocb in outer_specs[v]
                        )
                        for v in c["varspecs"]
                        if v in outer_specs
                    )
                ]
        self._prune_join_incompatible(meta)

        frames: list[DataFrame] = []
        for idx, (s, p, o) in enumerate(patterns):
            if idx in closure_frames:
                frames.append(closure_frames[idx])
                continue
            cands = meta[idx]
            if not cands:
                return self.spark.createDataFrame([], "dummy string").limit(0)
            frames.append(
                reduce(
                    lambda a, b: a.unionByName(b),
                    [
                        self._pattern_frame(
                            c["cb"], c["constraints"], c["post"], s, c["popt"], o
                        )
                        for c in cands
                    ],
                )
            )

        # selectivity-ordered join: most-bound pattern first, then
        # greedily extend with connected patterns (shared variable with
        # the accumulated frame) — see bgp_join_order.  Inner joins
        # commute, so the BINDINGS are identical; the ORDER decides the
        # size of intermediates, which AQE can only partially repair
        # after a bad start (URIMakerRule ordering in the reference).
        # Joins compare at RDF-TERM level (rdf_term_join): lexical value
        # PLUS canonical literal metadata where both sides carry the
        # companion set — i.e. for OBJECT-position/object-position var
        # pairs, which is where differing metadata can exist; there the
        # r4 order-dependence is closed.  A var bound in subject
        # position on one side has no companions and joins lexically
        # (URIs carry no metadata; the residual URI-vs-same-lexical-
        # literal case remains lexical, as before r5).
        pat_vars = []
        for idx in range(len(patterns)):
            if idx in closure_frames:
                pat_vars.append(
                    {c for c in frames[idx].columns if not _is_companion(c)}
                )
            else:
                vs = set()
                for t in patterns[idx]:
                    if t is not None and _is_var(t):
                        vs.add(_var_name(t))
                pat_vars.append(vs)
        order = bgp_join_order(patterns, pat_vars, set(closure_frames))
        frames = [frames[i] for i in order]

        out = frames[0]
        for nxt in frames[1:]:
            out = rdf_term_join(out, nxt, "inner")
        for name, excl in neg_filters:
            out = out.filter(~F.col(name).isin(*excl)).drop(
                name, *[name + sfx for sfx in _COMPANION_SUFFIXES]
            )
        maybe_unbound: set = set()
        for group in optional or []:
            # entry: plain pattern list, or (patterns, group-scoped
            # filters) — filters evaluate inside the LeftJoin condition
            pats, filts = group if isinstance(group, tuple) else (group, [])
            rdf = self.bgp(pats)
            # shared vars that were definitely bound on the left stay
            # bound after the left join; everything else the optional
            # group binds can be NULL in later groups and needs
            # compatibility (not equality) semantics there
            shared_bound = {
                c for c in out.columns if c in rdf.columns and not _is_companion(c)
            } - maybe_unbound
            out = optional_join(out, rdf, filts, maybe_unbound=maybe_unbound)
            maybe_unbound |= {
                c for c in rdf.columns if not _is_companion(c)
            } - shared_bound
        for f in filters or []:
            out = out.filter(F.expr(f))
        return out

    # ------------------------------------------------------------------
    def triples(self, fuse: bool = True, distinct="auto") -> DataFrame:
        """Full virtual graph (dump-rdf / Mapping.getData() analogue).

        ``distinct``:
          'auto' (default) — reference semantics (Relation.isUnique,
            SURVEY §2.7 U2): per-relation DISTINCT only where the
            classmap declares d2rq:containsDuplicates (already applied
            inside bridge_df); no global dedup.  Bridges mint subjects
            from per-row keys and predicates are bridge-constants, so
            cross-bridge duplicates cannot arise from a well-formed
            mapping — exactly the reasoning the reference applies.
            This keeps the dump a pure map-side pipeline: scan → mint →
            union → sink, NO global shuffle (the difference between
            ~0.6 and ~1.0 scaling efficiency at 4× parallelism).
          True — strict RDF-set semantics: global dropDuplicates on the
            triple identity (one full shuffle).  Use when the mapping
            may emit overlapping triples from different bridges.
          False — raw union, even per-relation duplicates kept."""
        if fuse:
            df = self.compiler.fused_df(self.bridges)
        else:
            frames = [self.compiler.bridge_df(cb) for cb in self.bridges]
            if not frames:
                return self.spark.createDataFrame([], TRIPLE_SCHEMA)
            df = reduce(lambda a, b: a.unionByName(b), frames)
        if self.mapping.configuration.serve_vocabulary:
            from ont_d2rq_spark.schema_graph import schema_triples

            df = df.unionByName(schema_triples(self.mapping, self.spark))
        if distinct is True:
            df = df.dropDuplicates(["subj", "pred", "obj", "obj_datatype", "obj_lang"])
        return df

    def cache(self) -> "VirtualGraph":
        """Persist the fused triples DAG (whole-graph caching)."""
        from pyspark import StorageLevel

        t = self.triples().persist(StorageLevel.MEMORY_AND_DISK)
        self._cached.append(t)
        return self


    # ------------------------------------------------------------------
    # N-Triples serialization (dump-rdf sink, SURVEY §2.1 S6)
    # ------------------------------------------------------------------
    @staticmethod
    def _nt_escape(col):
        for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
            col = F.replace(col, F.lit(a), F.lit(b))
        return col

    @staticmethod
    def _bnode_label(col):
        """Internal blank-node ids ('_:map@@k1@@k2') carry characters
        N-Triples forbids in BLANK_NODE_LABEL ('@', spaces, …).  At
        serialization time emit `_:b<md5(internal id)>` — valid under
        the grammar, collision-free, and stable per node (the same
        internal id always serializes to the same label, preserving
        graph isomorphism, like the reference's Jena-assigned labels)."""
        return F.concat(F.lit("_:b"), F.md5(col))

    def nt_lines(self, triples: Optional[DataFrame] = None) -> DataFrame:
        t = triples if triples is not None else self.triples()
        subj = F.when(t.subj.startswith("_:"), self._bnode_label(t.subj)).otherwise(
            F.concat(F.lit("<"), t.subj, F.lit(">"))
        )
        pred = F.concat(F.lit("<"), t.pred, F.lit(">"))
        lit = F.concat(F.lit('"'), self._nt_escape(t.obj), F.lit('"'))
        lit = F.when(
            t.obj_lang.isNotNull(), F.concat(lit, F.lit("@"), t.obj_lang)
        ).otherwise(
            F.when(
                t.obj_datatype.isNotNull(),
                F.concat(lit, F.lit("^^<"), t.obj_datatype, F.lit(">")),
            ).otherwise(lit)
        )
        obj = F.when(t.is_literal, lit).otherwise(
            F.when(t.obj.startswith("_:"), self._bnode_label(t.obj)).otherwise(
                F.concat(F.lit("<"), t.obj, F.lit(">"))
            )
        )
        return t.select(
            F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, F.lit(" .")).alias("line")
        )

    def dump_nt(self, path: str, triples: Optional[DataFrame] = None) -> None:
        self.nt_lines(triples).write.mode("overwrite").text(path)

    # ------------------------------------------------------------------
    # Turtle serialization (dump-rdf --format TURTLE parity)
    # ------------------------------------------------------------------
    def _default_prefixes(self) -> dict:
        return {
            "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "owl": "http://www.w3.org/2002/07/owl#",
            "xsd": "http://www.w3.org/2001/XMLSchema#",
            "ex": self.mapping.base_iri,
        }

    def _ttl_iri(self, col, prefixes: dict):
        """IRI column → prefixed name when the namespace matches and the
        local part is PN_LOCAL-safe (conservative: leading char must be
        a letter/digit/underscore — Turtle PN_LOCAL may not START with
        '-'), else the <…> form.  Blank nodes keep their stable _:b
        labels.

        Namespaces are applied SHORTEST-FIRST in the when/otherwise
        chain so the longest match ends OUTERMOST (evaluated first) —
        with overlapping namespaces (…/voc and …/voc2) the more
        specific prefix must win or locals mis-attach."""
        out = F.concat(F.lit("<"), col, F.lit(">"))
        for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1] or "")):
            if not ns:
                continue
            local = F.substring(col, len(ns) + 1, 1 << 20)
            out = F.when(
                col.startswith(ns) & local.rlike("^[A-Za-z0-9_][A-Za-z0-9_-]*$"),
                F.concat(F.lit(pfx + ":"), local),
            ).otherwise(out)
        return F.when(col.startswith("_:"), self._bnode_label(col)).otherwise(out)

    def ttl_lines(
        self, triples: Optional[DataFrame] = None, prefixes: Optional[dict] = None
    ) -> DataFrame:
        """One Turtle line per SUBJECT: `s p1 o1 ; p2 o2 .` with sorted
        predicate-object pairs (deterministic) — the distributed shape
        of a Turtle writer (one groupBy on subj; blocks stream out of
        the aggregation, never driver-side)."""
        pfx = prefixes if prefixes is not None else self._default_prefixes()
        t = triples if triples is not None else self.triples()
        lit = F.concat(F.lit('"'), self._nt_escape(t.obj), F.lit('"'))
        lit = F.when(
            t.obj_lang.isNotNull(), F.concat(lit, F.lit("@"), t.obj_lang)
        ).otherwise(
            F.when(
                t.obj_datatype.isNotNull(),
                F.concat(lit, F.lit("^^"), self._ttl_iri(t.obj_datatype, pfx)),
            ).otherwise(lit)
        )
        obj = F.when(t.is_literal, lit).otherwise(self._ttl_iri(t.obj, pfx))
        pred = F.when(
            t.pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", F.lit("a")
        ).otherwise(self._ttl_iri(t.pred, pfx))
        po = F.concat(pred, F.lit(" "), obj)
        return (
            t.select(self._ttl_iri(t.subj, pfx).alias("s"), po.alias("po"))
            .groupBy("s")
            .agg(F.array_sort(F.collect_set("po")).alias("pos"))
            .select(
                F.concat(
                    F.col("s"), F.lit(" "), F.array_join("pos", " ; "), F.lit(" .")
                ).alias("line")
            )
        )

    def dump_ttl(
        self,
        path: str,
        triples: Optional[DataFrame] = None,
        prefixes: Optional[dict] = None,
    ) -> None:
        """Write a Turtle dump: part files of subject blocks plus a
        `_prefixes.ttl` header that sorts before `part-*`, so
        `cat dir/*.ttl dir/part-*` (or any lexical concat) yields a
        valid document.  (Spark data readers skip `_`-prefixed files.)"""
        import os

        pfx = prefixes if prefixes is not None else self._default_prefixes()
        self.ttl_lines(triples, pfx).write.mode("overwrite").text(path)
        header = "".join(
            f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(pfx.items()) if ns
        )
        with open(os.path.join(path, "_prefixes.ttl"), "w") as f:
            f.write(header)


class CachingGraph:
    """Memoizing find() wrapper — the analogue of ont-d2rq's
    jena/CachingGraph.java: repeated find(s,p,o) patterns return the
    persisted result (MEMORY_AND_DISK) instead of re-planning and
    re-scanning; the second call's physical plan reads an
    InMemoryRelation.  LRU eviction under a BYTE budget (``max_bytes``,
    matching the reference's size-budget semantics) with ``max_entries``
    as a secondary cap; an entry's size is Catalyst's optimized-plan
    ``sizeInBytes`` estimate — the same statistic broadcast decisions
    trust — so 128 small point-lookup frames coexist while two
    dump-sized frames already evict.  Evicted entries are unpersisted so
    cached blocks never outlive the budget; the most-recent entry
    always survives (evicting what the caller just asked for would
    thrash).  Typed lookups (o_datatype / o_lang) key separately:
    find(o='42') and find(o='42', o_datatype=xsd:integer) are different
    patterns."""

    def __init__(
        self,
        graph: VirtualGraph,
        max_bytes: int = 512 << 20,
        max_entries: int = 128,
    ):
        self.graph = graph
        self.max_bytes = max_bytes
        self.max_entries = max_entries
        self._cache: "dict[tuple, DataFrame]" = {}
        self._sizes: "dict[tuple, int]" = {}
        self.total_bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _entry_size(df: DataFrame) -> int:
        """Catalyst's optimized-plan size estimate for the frame.  An
        estimate, not a measurement — but it is available BEFORE
        materialization (a measured cached-block size would require
        blocking on the job) and errs large for joins, which is the
        safe direction for a memory budget."""
        try:
            return int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return 0  # no JVM stats (mock/test frame): entry-count cap only

    def find(self, s=None, p=None, o=None, o_datatype=None, o_lang=None) -> DataFrame:
        from pyspark import StorageLevel

        key = (s, p, o, o_datatype, o_lang)
        hit = self._cache.pop(key, None)
        if hit is not None:
            self.hits += 1
            self._cache[key] = hit  # re-insert = most-recently-used
            return hit
        self.misses += 1
        # .select("*") forces a FRESH Dataset before persist: find() can
        # return a memoized frame (the compiler's bridge_df cache) whose
        # QueryExecution was already planned by an earlier action — a
        # lazy val, so persisting THAT object would never retrofit the
        # InMemoryRelation substitution and every "hit" would silently
        # recompute.  A new Dataset plans after registration and reads
        # the cached blocks.
        df = self.graph.find(s, p, o, o_datatype, o_lang).select("*").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        self._cache[key] = df
        self._sizes[key] = self._entry_size(df)
        self.total_bytes += self._sizes[key]
        while len(self._cache) > 1 and (
            len(self._cache) > self.max_entries or self.total_bytes > self.max_bytes
        ):
            # dicts iterate in insertion order → first key is the LRU
            old = next(iter(self._cache))
            self._cache.pop(old).unpersist()
            self.total_bytes -= self._sizes.pop(old)
        return df

    def clear(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
        self._sizes.clear()
        self.total_bytes = 0

    def __getattr__(self, name):
        return getattr(self.graph, name)
