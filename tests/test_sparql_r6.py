"""Round-6 SPARQL semantics: query-level (trailing) VALUES bottom-up
scoping, CONSTRUCT WHERE template blank nodes, and the metamorphic
fuzz harness for the recursive group evaluator (the reference inherits
all three behaviors from ARQ — engine/QueryEngineD2RQ.java delegation,
public layout)."""

import pytest

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph
from ont_d2rq_spark.sparql import SparqlError, execute

SF = "/root/testdata/sf0.001"
EX = "http://example.org/"


@pytest.fixture(scope="module")
def graph(spark):
    return VirtualGraph(tpch_mapping(SF), spark)


# ---------------------------------------------------------------------------
# trailing query-level VALUES: joined AFTER the WHERE group (18.2.2),
# so a group FILTER referencing its var sees UNBOUND (error -> false)
# ---------------------------------------------------------------------------


def test_trailing_values_out_of_scope_for_where_filter(graph):
    """?want is bound only by the query-level VALUES; inside WHERE it
    is unbound, the FILTER errors -> false, and the query is empty —
    NOT filtered-then-joined."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?rn ?want WHERE {{
          ?r a ex:Region . ?r ex:name ?rn .
          FILTER(?rn = ?want)
        }}
        VALUES ?want {{ "ASIA" }}""",
    )
    assert df.count() == 0


def test_trailing_values_still_joins_bindings(graph):
    """Control: without a group filter the trailing VALUES behaves as
    the ordinary join with the WHERE solutions."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?rn ?extra WHERE {{ ?r a ex:Region . ?r ex:name ?rn }}
        VALUES (?rn ?extra) {{ ("ASIA" "a") ("AFRICA" "b") }}""",
    )
    rows = {(r["rn"], r["extra"]) for r in df.collect()}
    assert rows == {("ASIA", "a"), ("AFRICA", "b")}


def test_group_values_still_in_scope_for_filter(graph):
    """A VALUES INSIDE the group is same-group: its var IS visible to
    the group's FILTER (regression guard for the scoping split)."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?rn WHERE {{
          ?r a ex:Region . ?r ex:name ?rn .
          VALUES ?want {{ "ASIA" }}
          FILTER(?rn = ?want)
        }}""",
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["rn"] == "ASIA"


def test_trailing_values_undef_compat(graph):
    """UNDEF cells in a trailing VALUES constrain nothing for that row."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?rn ?tag WHERE {{ ?r a ex:Region . ?r ex:name ?rn }}
        VALUES (?rn ?tag) {{ ("ASIA" "x") (UNDEF "y") }}""",
    )
    rows = df.collect()
    tags = [r["tag"] for r in rows]
    # (ASIA,x) matches once; (UNDEF,y) is compatible with all 5 regions
    assert tags.count("x") == 1 and tags.count("y") == 5


# ---------------------------------------------------------------------------
# CONSTRUCT WHERE + blank-node property list: the template instantiates
# a FRESH bnode per solution, not the matched term
# ---------------------------------------------------------------------------


def test_construct_where_bnode_template_fresh_labels(graph):
    """`[ ex:inRegion ?r ]` matches the 25 nations, but the TEMPLATE
    emits a fresh bnode per solution — never the matched nation IRI."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        CONSTRUCT WHERE {{ ?r a ex:Region . ?r ex:name ?rn . [ ex:inRegion ?r ] }}""",
    )
    rows = df.collect()
    inreg = [r for r in rows if r["pred"] == EX + "inRegion"]
    # one fresh bnode subject per solution (25 nation matches)
    assert len(inreg) == 25
    subs = {r["subj"] for r in inreg}
    assert len(subs) == 25
    assert all(s.startswith("_:") for s in subs)
    # the name triples still carry the real region subjects
    names = [r for r in rows if r["pred"] == EX + "name"]
    assert len(names) == 5 and all(not r["subj"].startswith("_:") for r in names)


def test_construct_where_bnode_same_solution_same_label(graph):
    """Within ONE solution the bracketed bnode keeps a single identity
    across the triples it participates in."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        CONSTRUCT WHERE {{ [ ex:inRegion ?r ; ex:name ?nn ] }}""",
    )
    rows = df.collect()
    inreg = {r["subj"]: r["obj"] for r in rows if r["pred"] == EX + "inRegion"}
    name = {r["subj"]: r["obj"] for r in rows if r["pred"] == EX + "name"}
    assert len(inreg) == 25 and set(inreg) == set(name)
    assert all(s.startswith("_:") for s in inreg)


# ---------------------------------------------------------------------------
# metamorphic fuzz harness: hypothesis-generated nested
# OPTIONAL/UNION/MINUS/BIND/FILTER group trees (depth <=3) executed by
# the recursive DataFrame evaluator over a tiny explicit triple graph,
# cross-checked against a naive in-memory solution-multiset evaluator
# implementing the SPARQL 1.1 algebra directly (Join/LeftJoin/Union/
# Minus/Extend/Filter over binding dicts).  The reference gets the
# residual algebra from ARQ's OpExecutor, battle-tested upstream; this
# engine's recursive _eval_where is home-grown and earns its trust here.
# ---------------------------------------------------------------------------

import itertools
import os
from collections import Counter
from dataclasses import dataclass, field

from hypothesis import given, settings
from hypothesis import strategies as st

from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA
from ont_d2rq_spark.graph import bgp_over_triples

# fixed tiny graph: IRIs and literal lexicals are DISJOINT, every
# literal is plain (RDF-term equality == lexical equality), so the
# naive term tuples and the engine's projected lexical columns compare
# 1:1.  r-edges form chains so multi-pattern joins have real matches.
_FUZZ_TRIPLES = [
    ("s1", "p", ("lit", "a")),
    ("s1", "p", ("lit", "c")),
    ("s1", "q", ("lit", "b")),
    ("s1", "r", ("iri", EX + "s4")),
    ("s2", "p", ("lit", "a")),
    ("s2", "q", ("lit", "c")),
    ("s2", "r", ("iri", EX + "s3")),
    ("s3", "p", ("lit", "b")),
    ("s3", "q", ("lit", "a")),
    ("s3", "r", ("iri", EX + "s1")),
    ("s4", "p", ("lit", "c")),
    ("s4", "r", ("iri", EX + "s2")),
]
_NTRIPLES = [
    (("iri", EX + s), ("iri", EX + p), o) for s, p, o in _FUZZ_TRIPLES
]


class _TriplesGraph:
    """Minimal graph surface the SPARQL evaluator needs (bgp / spark /
    named-graph hooks), over an explicit TRIPLE_SCHEMA frame — the same
    generic path named graphs use (bgp_over_triples)."""

    def __init__(self, spark):
        self.spark = spark
        rows = [
            (EX + s, EX + p, o[1], None, None, o[0] == "lit")
            for s, p, o in _FUZZ_TRIPLES
        ]
        self._tdf = spark.createDataFrame(rows, TRIPLE_SCHEMA).cache()
        self._tdf.count()

    def bgp(self, patterns):
        return bgp_over_triples(self._tdf, patterns)

    def graph_names(self):
        return []

    def graph_scoped_bgp(self, iri, patterns):
        return bgp_over_triples(
            self.spark.createDataFrame([], TRIPLE_SCHEMA), patterns
        )

    def graph_triples(self, iri):
        return self.spark.createDataFrame([], TRIPLE_SCHEMA)

    def triples(self, fuse=True, distinct="auto"):
        return self._tdf


@pytest.fixture(scope="module")
def fuzz_graph(spark):
    return _TriplesGraph(spark)


@dataclass
class _G:
    patterns: list = field(default_factory=list)
    union: tuple = None
    optionals: list = field(default_factory=list)
    minus: list = field(default_factory=list)
    binds: list = field(default_factory=list)  # exprs pre-finalize, (name, expr) after
    filters: list = field(default_factory=list)


# --- generation -----------------------------------------------------------

_VARS = ["?v0", "?v1", "?v2", "?v3"]
_IRI_TERMS = [("iri", EX + s) for s in ("s1", "s2", "s3", "s4")]
_PRED_TERMS = [("iri", EX + p) for p in ("p", "q", "r")]
_LIT_TERMS = [("lit", x) for x in ("a", "b", "c")]

_subj_t = st.sampled_from(_VARS * 2 + _IRI_TERMS)
_obj_t = st.sampled_from(_VARS * 2 + _LIT_TERMS + _IRI_TERMS)
_pat_t = st.tuples(_subj_t, st.sampled_from(_PRED_TERMS), _obj_t)

_fvar_t = st.sampled_from(["v0", "v1", "v2", "v3", "b0"])
_filter_t = st.one_of(
    st.tuples(
        st.just("cmp"),
        _fvar_t,
        st.sampled_from(["=", "!="]),
        st.sampled_from(["a", "b", "c"]),
    ),
    st.tuples(st.just("bound"), _fvar_t),
    st.tuples(st.just("notbound"), _fvar_t),
)
_bindexpr_t = st.one_of(
    st.tuples(st.just("const"), st.sampled_from(["a", "x"])),
    st.tuples(st.just("copy"), st.sampled_from(["v0", "v1", "v2", "v3"])),
)


def _group_t(depth: int, top: bool = False):
    """Depth-bounded group tree.  Breadth narrows with depth (nested
    optional_join plans grow multiplicatively in Catalyst analysis
    cost — a lean tree keeps the 200-example run in CI budget while
    still exercising every pairwise nesting across examples)."""
    sub = _group_t(depth - 1) if depth > 0 else None
    return st.builds(
        _G,
        patterns=st.lists(_pat_t, min_size=1, max_size=3 if top else 2),
        union=(st.none() | st.tuples(sub, sub)) if sub else st.none(),
        optionals=st.lists(sub, max_size=2 if top else 1) if sub else st.just([]),
        minus=st.lists(sub, max_size=1) if sub else st.just([]),
        binds=st.lists(_bindexpr_t, max_size=1),
        filters=st.lists(_filter_t, max_size=2),
    )


def _finalize(g: _G, counter=None) -> _G:
    """Assign globally-unique BIND target names (?b0, ?b1, ...) — BIND
    may not rebind an in-scope var, and unique targets keep Extend
    commutative with the engine's fixed fold order."""
    if counter is None:
        counter = itertools.count()
        if not _proj_vars(g):
            g.patterns[0] = ("?v0",) + tuple(g.patterns[0][1:])
    g.binds = [(f"b{next(counter)}", ex) for ex in g.binds]
    for b in (list(g.union) if g.union else []) + g.optionals + g.minus:
        _finalize(b, counter)
    return g


def _proj_vars(g: _G) -> set:
    """In-scope (projectable) vars: pattern vars + BIND targets, through
    UNION branches and OPTIONAL bodies — NOT through MINUS bodies
    (MINUS never binds, SPARQL 18.2.1 in-scope table)."""
    vs = set()
    for pat in g.patterns:
        vs |= {t[1:] for t in pat if isinstance(t, str)}
    vs |= {name for name, _ in g.binds if isinstance(name, str)}
    for b in (list(g.union) if g.union else []) + g.optionals:
        vs |= _proj_vars(b)
    return vs


# --- serialization to SPARQL text ------------------------------------------


def _term_txt(t) -> str:
    if isinstance(t, str):
        return t
    kind, lex = t
    return f"<{lex}>" if kind == "iri" else f'"{lex}"'


def _filter_txt(f) -> str:
    if f[0] == "cmp":
        return f'FILTER (?{f[1]} {f[2]} "{f[3]}")'
    if f[0] == "bound":
        return f"FILTER (BOUND(?{f[1]}))"
    return f"FILTER (!BOUND(?{f[1]}))"


def _ser(g: _G) -> str:
    parts = [f"{_term_txt(s)} {_term_txt(p)} {_term_txt(o)} ." for s, p, o in g.patterns]
    if g.union:
        parts.append("{ " + _ser(g.union[0]) + " } UNION { " + _ser(g.union[1]) + " }")
    parts += ["OPTIONAL { " + _ser(b) + " }" for b in g.optionals]
    parts += ["MINUS { " + _ser(b) + " }" for b in g.minus]
    for name, ex in g.binds:
        src = f"?{ex[1]}" if ex[0] == "copy" else f'"{ex[1]}"'
        parts.append(f"BIND({src} AS ?{name})")
    parts += [_filter_txt(f) for f in g.filters]
    return " ".join(parts)


# --- naive SPARQL-algebra evaluator ----------------------------------------


def _nv_compat(a: dict, b: dict) -> bool:
    return all(a[k] == b[k] for k in a.keys() & b.keys())


def _nv_join(A: list, B: list) -> list:
    return [{**a, **b} for a in A for b in B if _nv_compat(a, b)]


def _nv_match(pat) -> list:
    out = []
    for trip in _NTRIPLES:
        sol, ok = {}, True
        for t, tt in zip(pat, trip):
            if isinstance(t, str):
                v = t[1:]
                if v in sol and sol[v] != tt:
                    ok = False
                    break
                sol[v] = tt
            elif t != tt:
                ok = False
                break
        if ok:
            out.append(sol)
    return out


def _nv_filter(f, sol: dict) -> bool:
    """SPARQL error semantics: comparison over an unbound var is an
    error -> effective false; BOUND() is total."""
    if f[0] == "bound":
        return f[1] in sol
    if f[0] == "notbound":
        return f[1] not in sol
    t = sol.get(f[1])
    if t is None:
        return False
    return (t[1] == f[3]) if f[2] == "=" else (t[1] != f[3])


def _nv_body(g: _G) -> list:
    """Group solutions with the group's TOP-LEVEL filters NOT applied
    (they belong to the caller: group filter, or LeftJoin condition
    when the group is an OPTIONAL operand)."""
    sols = None
    if g.patterns:
        sols = [{}]
        for pat in g.patterns:
            sols = _nv_join(sols, _nv_match(pat))
    if g.union:
        u = _nv_eval(g.union[0]) + _nv_eval(g.union[1])
        sols = u if sols is None else _nv_join(sols, u)
    if sols is None:
        sols = [{}]
    for og in g.optionals:
        right, cond = _nv_body(og), og.filters
        nxt = []
        for a in sols:
            hits = [
                {**a, **b}
                for b in right
                if _nv_compat(a, b)
                and all(_nv_filter(f, {**a, **b}) for f in cond)
            ]
            nxt.extend(hits if hits else [a])
        sols = nxt
    for name, ex in g.binds:
        nxt = []
        for s in sols:
            val = ("lit", ex[1]) if ex[0] == "const" else s.get(ex[1])
            s2 = dict(s)
            if val is not None:
                s2[name] = val
            nxt.append(s2)
        sols = nxt
    for mg in g.minus:
        right = _nv_eval(mg)
        sols = [
            a
            for a in sols
            if not any(_nv_compat(a, b) and (a.keys() & b.keys()) for b in right)
        ]
    return sols


def _nv_eval(g: _G) -> list:
    return [s for s in _nv_body(g) if all(_nv_filter(f, s) for f in g.filters)]


# --- the property -----------------------------------------------------------


# CI runs the fixed derandomized 200; SPARK_GRAFT_FUZZ_SOAK=N runs N
# fresh random examples instead (exploratory soak, not for CI)
_SOAK = int(os.environ.get("SPARK_GRAFT_FUZZ_SOAK", "0"))


@settings(
    max_examples=_SOAK or 200,
    deadline=None,
    derandomize=not _SOAK,
    database=None,
)
@given(_group_t(2, top=True))
def test_fuzz_recursive_evaluator_matches_algebra(fuzz_graph, g):
    g = _finalize(g)
    pvars = sorted(_proj_vars(g))
    query = "SELECT " + " ".join(f"?{v}" for v in pvars) + " WHERE { " + _ser(g) + " }"
    got = Counter(
        tuple(row[v] for v in pvars) for row in execute(fuzz_graph, query).collect()
    )
    want = Counter(
        tuple(s[v][1] if v in s else None for v in pvars) for s in _nv_eval(g)
    )
    assert got == want, query


# ---------------------------------------------------------------------------
# repetition over a negated property set: !p+ / !(p|^q)* — the NPS
# evaluation supplies the closure's base edge set (SPARQL 18.4 path
# translation composes NPS under PathMod; ARQ evaluates it natively)
# ---------------------------------------------------------------------------


def test_nps_plus_single_hop_equals_plain_nps(graph):
    """From a nation, the only non-(name|type) outgoing edge is
    inRegion, and regions have no further non-excluded edges — so the
    closure equals the single-hop NPS result."""
    plus = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?n ?x WHERE {{ ?n a ex:Nation . ?n !(ex:name|a)+ ?x }}""",
    )
    plain = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?n ?x WHERE {{ ?n a ex:Nation . ?n !(ex:name|a) ?x }}""",
    )
    assert sorted(map(tuple, plus.collect())) == sorted(map(tuple, plain.collect()))
    assert plus.count() == 25


def test_nps_plus_multi_hop(graph):
    """Customer --inNation--> nation --inRegion--> region: with every
    other customer-outgoing predicate excluded, !S+ reaches exactly the
    nation (1 hop) and its region (2 hops) per customer."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?c ?x WHERE {{
          ?c a ex:Customer .
          ?c !(ex:name|a|ex:acctbal|ex:marketSegment|ex:display)+ ?x
        }}""",
    )
    xs = [r["x"] for r in df.collect()]
    assert len(xs) == 300  # 150 customers x (nation + region)
    assert sum(1 for x in xs if x.startswith(EX + "nation/")) == 150
    assert sum(1 for x in xs if x.startswith(EX + "region/")) == 150


def test_nps_star_bound_subject(graph):
    """!S* adds the zero-length identity for the bound subject."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}nation/3> !(ex:name|a)* ?x }}""",
    )
    got = {r["x"] for r in df.collect()}
    assert f"{EX}nation/3" in got
    assert len(got) == 2 and any(x.startswith(f"{EX}region/") for x in got)


def test_nps_plus_mixed_directions_cycle(spark):
    """Mixed NPS under + over an explicit frame: forward non-'skip'
    edges plus inverse non-'back' edges form a cycle a→b→c→a; the
    closure from each node reaches all three (itself included).  Kept
    on a tiny explicit graph on purpose: a mixed set makes the base
    near-undirected, and the global closure of a near-undirected edge
    set is all-pairs-per-component — pathological on any real graph
    (closure.py documents the quadratic worst case)."""
    from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA
    from ont_d2rq_spark.graph import bgp_over_triples
    from ont_d2rq_spark.sparql import parse

    rows = [
        ("a", "http://x/next", "b", None, None, False),
        ("b", "http://x/next", "c", None, None, False),
        ("a", "http://x/rev", "c", None, None, False),  # c→a via ^
        ("a", "http://x/skip", "c", None, None, False),
        ("c", "http://x/back", "b", None, None, False),
    ]
    tdf = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    q = parse("SELECT ?s ?o WHERE { ?s !(<http://x/skip>|^<http://x/back>)+ ?o }")
    ((s, p, o),) = q.patterns
    got = {(r["s"], r["o"]) for r in bgp_over_triples(tdf, [(s, p, o)]).collect()}
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_nps_plus_inverse_of_closure_is_closure_of_inverse(graph):
    """^(!S)+ must equal !S+ with endpoints swapped (the parser folds ^
    into the member directions; inverse of a closure == closure of the
    inverted edge set)."""
    fwd = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?a ?b WHERE {{ ?a a ex:Nation . ?a !(ex:name|a)+ ?b }}""",
    )
    inv = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?a ?b WHERE {{ ?b a ex:Nation . ?a ^!(ex:name|a)+ ?b }}""",
    )
    assert sorted((r["a"], r["b"]) for r in fwd.collect()) == sorted(
        (r["b"], r["a"]) for r in inv.collect()
    )


def test_nps_plus_over_explicit_triple_frame(spark):
    """bgp_over_triples (the named-graph / dataset path) honors
    PathPlus(NegatedSet): closure over a chain whose 'skip' edges are
    excluded by predicate."""
    from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA
    from ont_d2rq_spark.graph import NegatedSet, PathPlus, bgp_over_triples

    rows = [
        ("n1", "http://x/next", "n2", None, None, False),
        ("n2", "http://x/next", "n3", None, None, False),
        ("n3", "http://x/next", "n4", None, None, False),
        ("n1", "http://x/skip", "n4", None, None, False),
        ("n2", "http://x/name", "two", None, None, True),
    ]
    tdf = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    nps = NegatedSet(fwd=("http://x/skip", "http://x/name"))
    out = bgp_over_triples(tdf, [("?s", PathPlus(nps, "+"), "?o")])
    got = {(r["s"], r["o"]) for r in out.collect()}
    assert got == {
        ("n1", "n2"), ("n1", "n3"), ("n1", "n4"),
        ("n2", "n3"), ("n2", "n4"), ("n3", "n4"),
    }


# ---------------------------------------------------------------------------
# seeded closure (bound-endpoint property paths): frontier BFS instead
# of the global squaring — the global closure materializes every node's
# reachability set to answer a one-node question
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_closure_from_chain_and_reverse(spark):
    from ont_d2rq_spark.operators.closure import closure_from

    e = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(6)])
    fwd = closure_from(e, "n2")
    assert {(r["src"], r["dst"]) for r in fwd.collect()} == {
        ("n2", f"n{j}") for j in range(3, 7)
    }
    rev = closure_from(e, "n2", reverse=True)
    assert {(r["src"], r["dst"]) for r in rev.collect()} == {
        (f"n{j}", "n2") for j in range(0, 2)
    }


def test_closure_from_cycle_reaches_seed(spark):
    from ont_d2rq_spark.operators.closure import closure_from

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    got = {(r["src"], r["dst"]) for r in closure_from(e, "a").collect()}
    assert got == {("a", "b"), ("a", "c"), ("a", "a"), ("a", "d")}


def test_closure_from_no_edges_and_depth_cap(spark):
    from ont_d2rq_spark.operators.closure import closure_from

    e = _edges(spark, [("x", "y")])
    assert closure_from(e, "z").count() == 0
    deep = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(8)])
    assert closure_from(deep, "n0", max_rounds=3) is None  # cap -> global path


def test_closure_from_matches_global_on_dag(spark):
    from ont_d2rq_spark.operators.closure import closure_from, transitive_closure

    pairs = [("r", "a"), ("r", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
             ("b", "d"), ("q", "r"), ("z", "z2")]
    e = _edges(spark, pairs)
    seeded = {(r["src"], r["dst"]) for r in closure_from(e, "r").collect()}
    glob = {
        (r["src"], r["dst"])
        for r in transitive_closure(e).filter("src = 'r'").collect()
    }
    assert seeded == glob and seeded  # non-empty, identical


def test_bound_subject_path_uses_seeded_closure(graph):
    """End-to-end: a bound-subject p+ still answers correctly through
    the BFS path (result parity is the contract; the r3 bound-endpoint
    tests pin the * identity semantics)."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}nation/3> ex:inRegion+ ?x }}""",
    )
    got = [r["x"] for r in df.collect()]
    assert len(got) == 1 and got[0].startswith(EX + "region/")


# ---------------------------------------------------------------------------
# round-6 builtin surface: isBlank/isNumeric/sameTerm, date accessors,
# SHA384/512, UUID/STRUUID/RAND/NOW
# ---------------------------------------------------------------------------


def test_builtin_isblank_isiri_split(graph):
    """isIRI is FALSE for blank nodes (spec 17.4.2.1/2); the customer
    display bnodes... this mapping has IRI subjects only, so assert on
    the fuzz-style explicit check via BIND over IRIs and literals."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?r ?i ?b ?lit WHERE {{
          ?r a ex:Region . ?r ex:name ?n .
          BIND(isIRI(?r) AS ?i) BIND(isBlank(?r) AS ?b)
          BIND(isLiteral(?n) AS ?lit)
        }} LIMIT 1""",
    )
    row = df.collect()[0]
    assert row["i"] is True and row["b"] is False and row["lit"] is True


def test_builtin_isnumeric(graph):
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?c WHERE {{
          ?c a ex:Customer . ?c ex:acctbal ?bal . ?c ex:name ?n .
          FILTER(isNumeric(?bal) && !isNumeric(?n))
        }}""",
    )
    assert df.count() == 150  # every acctbal is xsd:decimal, names are strings


def test_builtin_sameterm_lang_sensitive(graph):
    """sameTerm('x'@en, 'x') is FALSE even though lexical forms match:
    customer names carry @en, supplier names are plain."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?cn ?sn WHERE {{
          ?c a ex:Customer . ?c ex:name ?cn .
          ?s a ex:Supplier . ?s ex:name ?sn .
          FILTER(sameTerm(?cn, ?sn))
        }}""",
    )
    assert df.count() == 0
    same = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?a WHERE {{
          ?r a ex:Region . ?r ex:name ?a . ?r2 ex:name ?b .
          ?r2 a ex:Region . FILTER(sameTerm(?a, ?b) && ?r = ?r2)
        }}""",
    )
    assert same.count() == 5


def test_builtin_date_accessors(graph):
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?y ?m ?d WHERE {{
          ?o a ex:Order . ?o ex:orderDate ?dt .
          BIND(YEAR(?dt) AS ?y) BIND(MONTH(?dt) AS ?m) BIND(DAY(?dt) AS ?d)
        }} LIMIT 5""",
    )
    for r in df.collect():
        assert 1992 <= int(r["y"]) <= 1998 and 1 <= int(r["m"]) <= 12
        assert 1 <= int(r["d"]) <= 31


def test_builtin_hashes_and_uuid(graph):
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?h384 ?h512 ?u ?su ?rnd WHERE {{
          ?r a ex:Region . ?r ex:name ?n .
          BIND(SHA384(?n) AS ?h384) BIND(SHA512(?n) AS ?h512)
          BIND(UUID() AS ?u) BIND(STRUUID() AS ?su) BIND(RAND() AS ?rnd)
        }} LIMIT 2""",
    )
    rows = df.collect()
    assert len(rows[0]["h384"]) == 96 and len(rows[0]["h512"]) == 128
    assert rows[0]["u"].startswith("urn:uuid:") and len(rows[0]["su"]) == 36
    assert 0.0 <= float(rows[0]["rnd"]) < 1.0
    assert rows[0]["u"] != rows[1]["u"]  # fresh per solution


def test_builtin_tz_and_seconds():
    from ont_d2rq_spark.sparql import _rewrite_builtins

    e = _rewrite_builtins("TZ(?d) = 'Z' && SECONDS(?d) > 10")
    assert "regexp_extract" in e and "date_format" in e
    e2 = _rewrite_builtins("NOW() > ?d")
    assert "current_timestamp()" in e2


def test_builtin_datatype_lang_literal_is_langstring(graph):
    """RDF 1.1: DATATYPE('x'@en) = rdf:langString (17.4.2.7) — customer
    names carry @en; supplier names are plain xsd:string."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?dc ?ds WHERE {{
          ?c a ex:Customer . ?c ex:name ?cn .
          ?s a ex:Supplier . ?s ex:name ?sn .
          BIND(DATATYPE(?cn) AS ?dc) BIND(DATATYPE(?sn) AS ?ds)
        }} LIMIT 1""",
    )
    row = df.collect()[0]
    assert row["dc"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    assert row["ds"] == "http://www.w3.org/2001/XMLSchema#string"
