"""Round-5 SPARQL semantics: string-literal safety in the LeftJoin
filter rewrite, maybe-unbound propagation through doubly-nested
subqueries, Turtle PN_LOCAL edge cases, and (below) nested group graph
patterns — OPTIONAL/UNION/BIND/VALUES evaluated recursively inside
other groups (the reference inherits this from ARQ's recursive
OpExecutor, engine/QueryEngineD2RQ.java)."""

import pytest
from pyspark.sql import functions as F

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph, optional_join
from ont_d2rq_spark.sparql import execute

SF = "/root/testdata/sf0.001"
EX = "http://example.org/"


@pytest.fixture(scope="module")
def graph(spark):
    return VirtualGraph(tpch_mapping(SF), spark)


# ---------------------------------------------------------------------------
# fix: compat-var rewrite must not touch quoted string constants
# ---------------------------------------------------------------------------


def test_optional_join_filter_string_constant_untouched(spark):
    """A maybe-unbound var's name occurring as a word INSIDE a quoted
    literal of a group-scoped FILTER must not be rewritten — the
    pre-fix \\b-regex turned `'see label'` into
    `'see coalesce(label, __lj_label)'`, silently changing the
    comparison value."""
    left = spark.createDataFrame(
        [("n1", "x"), ("n2", None)], "n string, label string"
    )
    right = spark.createDataFrame(
        [("n1", "see label"), ("n2", "see label")], "n string, note string"
    )
    out = optional_join(
        left, right, filters=["note = 'see label'"], maybe_unbound={"label"}
    ).collect()
    assert len(out) == 2
    # both rows keep their right-side match: the literal compared equal
    assert all(r["note"] == "see label" for r in out)


def test_optional_join_filter_compat_var_still_rewritten(spark):
    """Outside string constants the compat rewrite still applies: the
    merged binding (coalesce of left and adopted right value) is what
    the filter evaluates over."""
    left = spark.createDataFrame(
        [("n1", "keep"), ("n2", None)], "n string, tag string"
    )
    right = spark.createDataFrame(
        [("n1", "keep", "a"), ("n2", "keep", "b"), ("n2", "drop", "c")],
        "n string, tag string, v string",
    )
    out = optional_join(
        left, right, filters=["tag = 'keep'"], maybe_unbound={"tag"}
    ).collect()
    got = {(r["n"], r["tag"], r["v"]) for r in out}
    # n1 matches its bound tag; n2 adopts only the 'keep' row
    assert got == {("n1", "keep", "a"), ("n2", "keep", "b")}


# ---------------------------------------------------------------------------
# fix: maybe-unbound vars from doubly-nested subqueries
# ---------------------------------------------------------------------------


def test_doubly_nested_subquery_unbound_var(graph):
    """A var that only the innermost subquery's OPTIONAL can leave
    unbound must reach the OUTER join as maybe-unbound — pre-fix,
    _query_maybe_unbound did not recurse into q.subqueries, the outer
    join used null-rejecting equality, and the 20 unbound rows
    vanished."""
    df = execute(
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?n ?r WHERE {{
          ?n ex:inRegion ?r .
          {{ SELECT ?n ?r WHERE {{
               {{ SELECT ?n ?r WHERE {{
                    ?n a ex:Nation
                    OPTIONAL {{ ?n ex:inRegion ?r . FILTER(?r = <{EX}region/1>) }}
               }} }}
          }} }}
        }}""",
    )
    rows = df.collect()
    assert len(rows) == 25
    assert all(r["r"] is not None for r in rows)


# ---------------------------------------------------------------------------
# fix: Turtle PN_LOCAL may not start with '-'
# ---------------------------------------------------------------------------


def test_ttl_local_leading_dash_falls_back_to_iri_form(graph, spark):
    from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA

    t = spark.createDataFrame(
        [
            (EX + "-bad", EX + "p", EX + "good", None, None, False),
            (EX + "ok-1", EX + "p", EX + "x", None, None, False),
        ],
        TRIPLE_SCHEMA,
    )
    lines = [r["line"] for r in graph.ttl_lines(t, {"ex": EX}).collect()]
    joined = "\n".join(lines)
    # a local part STARTING with '-' is not PN_LOCAL: keep the <...> form
    assert f"<{EX}-bad>" in joined
    # interior '-' is fine and still compacts
    assert "ex:ok-1" in joined


# ---------------------------------------------------------------------------
# RDF-term-level BGP joins (value-join on literal companions)
# ---------------------------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"


def _tframe(spark, rows):
    from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA

    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_bgp_join_is_term_level_not_lexical(spark):
    """Two patterns binding the same var to the same LEXICAL form with
    different datatypes must NOT join ("42"^^xsd:string is a different
    RDF term than "42"^^xsd:integer); equal datatypes still join."""
    from ont_d2rq_spark.graph import bgp_over_triples

    t = _tframe(
        spark,
        [
            (EX + "a", EX + "p", "42", XSD + "string", None, True),
            (EX + "b", EX + "q", "42", XSD + "integer", None, True),
            (EX + "c", EX + "p", "7", XSD + "integer", None, True),
            (EX + "d", EX + "q", "7", XSD + "integer", None, True),
        ],
    )
    out = bgp_over_triples(t, [("?s", EX + "p", "?x"), ("?t", EX + "q", "?x")]).collect()
    assert {(r["s"], r["t"]) for r in out} == {(EX + "c", EX + "d")}


def test_bgp_join_simple_literal_equals_xsd_string(spark):
    """RDF 1.1: a simple literal IS xsd:string — the two spellings must
    join; lang tags compare case-insensitively; a URI never joins a
    same-lexical literal."""
    from ont_d2rq_spark.graph import bgp_over_triples

    t = _tframe(
        spark,
        [
            (EX + "a", EX + "p", "x", None, None, True),           # simple literal
            (EX + "b", EX + "q", "x", XSD + "string", None, True), # xsd:string
            (EX + "c", EX + "p", "hi", None, "EN", True),
            (EX + "d", EX + "q", "hi", None, "en", True),
            (EX + "e", EX + "p", EX + "u", None, None, False),     # URI object
            (EX + "f", EX + "q", EX + "u", None, None, True),      # literal, same lexical
        ],
    )
    out = bgp_over_triples(t, [("?s", EX + "p", "?x"), ("?t", EX + "q", "?x")]).collect()
    got = {(r["s"], r["t"]) for r in out}
    assert (EX + "a", EX + "b") in got       # simple ≡ xsd:string
    assert (EX + "c", EX + "d") in got       # lang case-insensitive
    assert not any(s == EX + "e" for s, _ in got)  # URI ≠ literal


def test_term_join_stays_hash_joinable(spark):
    """The canonical metadata keys are deterministic per-side
    expressions, so Catalyst must still plan a hash/sort-merge join —
    not a nested loop."""
    from ont_d2rq_spark.graph import bgp_over_triples

    t = _tframe(spark, [(EX + "a", EX + "p", "1", None, None, True)])
    plan = bgp_over_triples(
        t, [("?s", EX + "p", "?x"), ("?t", EX + "q", "?x")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# hash-joinable decomposition of the compatibility join
# ---------------------------------------------------------------------------


def test_compat_join_decomposed_results(spark):
    """Left rows partitioned by NULL-mask: bound rows join on equality,
    NULL rows adopt the right binding; unmatched rows survive unbound."""
    left = spark.createDataFrame(
        [("a", "r1"), ("b", None), ("d", None)], "n string, r string"
    )
    right = spark.createDataFrame(
        [("a", "r1", "x1"), ("a", "r2", "x2"), ("b", "r3", "x3"), ("c", "r4", "x4")],
        "n string, r string, x string",
    )
    out = optional_join(left, right, maybe_unbound={"r"}).collect()
    got = {(r["n"], r["r"], r["x"]) for r in out}
    assert got == {("a", "r1", "x1"), ("b", "r3", "x3"), ("d", None, None)}


def test_compat_join_decomposed_group_filter(spark):
    """A failing group filter un-binds the optional part (LeftJoin
    semantics) in every slice of the decomposition."""
    left = spark.createDataFrame([("a", "r1"), ("b", None)], "n string, r string")
    right = spark.createDataFrame(
        [("a", "r1", "x1"), ("b", "r3", "x3")], "n string, r string, x string"
    )
    out = optional_join(
        left, right, filters=["x != 'x3'"], maybe_unbound={"r"}
    ).collect()
    got = {(r["n"], r["r"], r["x"]) for r in out}
    # b's only candidate fails the filter → optional part unbound
    assert got == {("a", "r1", "x1"), ("b", None, None)}


def test_compat_join_decomposition_is_hash_joinable(spark):
    """With another always-bound shared var present, NO slice needs a
    nested-loop join — the r4 plan had one BroadcastNestedLoopJoin over
    the full input for the same query shape."""
    left = spark.createDataFrame([("a", "r1"), ("b", None)], "n string, r string")
    right = spark.createDataFrame(
        [("a", "r1", "x1"), ("b", "r3", "x3")], "n string, r string, x string"
    )
    plan = (
        optional_join(left, right, maybe_unbound={"r"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_compat_join_right_nullable_falls_back_symmetric(spark):
    """A right side that can itself leave the var NULL (subquery with
    its own OPTIONAL) keeps the symmetric isNull-or-equal semantics."""
    left = spark.createDataFrame([("a", "r1"), ("b", None)], "n string, r string")
    right = spark.createDataFrame(
        [("a", None, "x1"), ("b", "r3", "x3")], "n string, r string, x string"
    )
    out = optional_join(
        left, right, maybe_unbound={"r"}, right_maybe={"r"}, how="inner"
    ).collect()
    got = {(r["n"], r["r"], r["x"]) for r in out}
    # a: left r1 vs right NULL → compatible, keeps r1; b: adopts r3
    assert got == {("a", "r1", "x1"), ("b", "r3", "x3")}
