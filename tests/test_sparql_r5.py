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
