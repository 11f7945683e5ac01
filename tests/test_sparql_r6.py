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
