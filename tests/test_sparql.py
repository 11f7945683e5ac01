"""SPARQL front-end over the TPC-H mapping (E2 analogue)."""

import pytest

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph
from ont_d2rq_spark.sparql import SparqlError, execute, parse

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph(spark):
    return VirtualGraph(tpch_mapping(SF), spark)


def test_parse_forms():
    q = parse(
        """
        PREFIX ex: <http://example.org/>
        SELECT DISTINCT ?c ?name WHERE {
            ?c a ex:Customer .
            ?c ex:name ?name .
            FILTER (name like 'Customer%')
        } ORDER BY DESC(?name) LIMIT 5
        """
    )
    assert q.form == "SELECT" and q.distinct
    assert q.variables == ["c", "name"]
    assert len(q.patterns) == 2
    assert q.patterns[0][1].endswith("#type")
    assert q.order_by == [("name", True)] and q.limit == 5


def test_select_with_join_and_filter(graph):
    df = execute(
        graph,
        """
        PREFIX ex: <http://example.org/>
        SELECT ?name WHERE {
            ?c ex:inNation ?n .
            ?n ex:name "NATION_2" .
            ?c ex:name ?name .
            FILTER (name like 'Customer%')
        } ORDER BY ?name LIMIT 3
        """,
    )
    rows = [r["name"] for r in df.collect()]
    assert len(rows) == 3 and rows == sorted(rows)
    assert all(r.startswith("Customer#") for r in rows)


def test_predicate_and_object_lists(graph):
    df = execute(
        graph,
        """
        PREFIX ex: <http://example.org/>
        SELECT ?c ?bal WHERE {
            ?c a ex:Customer ; ex:acctbal ?bal .
        } LIMIT 7
        """,
    )
    assert df.count() == 7 and set(df.columns) == {"c", "bal"}


def test_optional(graph):
    df = execute(
        graph,
        """
        PREFIX ex: <http://example.org/>
        SELECT ?r ?rname WHERE {
            ?r a ex:Region .
            OPTIONAL { ?r ex:name ?rname . }
        }
        """,
    )
    assert df.count() == 5


def test_ask(graph):
    assert execute(
        graph,
        'PREFIX ex: <http://example.org/> ASK WHERE { ?c ex:name "ASIA" . }',
    ).first()["ask"]
    assert not execute(
        graph,
        'PREFIX ex: <http://example.org/> ASK WHERE { ?c ex:name "WAKANDA" . }',
    ).first()["ask"]


def test_union(graph):
    df = execute(
        graph,
        """
        PREFIX ex: <http://example.org/>
        SELECT ?who ?n WHERE {
            { ?who a ex:Customer . ?who ex:inNation ?n . }
            UNION
            { ?who a ex:Supplier . ?who ex:inNation ?n . }
        }
        """,
    )
    rows = df.collect()
    assert len(rows) == 150 + 10  # customers + suppliers at sf0.001
    subjects = {r["who"] for r in rows}
    assert any("/customer/" in s for s in subjects)
    assert any("/supplier/" in s for s in subjects)


def test_unsupported_raises():
    with pytest.raises(SparqlError):
        parse("SELECT ?x WHERE { BIND(1 AS ?y) }")
    with pytest.raises(SparqlError):
        parse("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }")


def test_offset_and_distinct(graph):
    all_rows = execute(
        graph,
        """PREFIX ex: <http://example.org/>
        SELECT DISTINCT ?name WHERE { ?n a ex:Nation . ?n ex:name ?name . }
        ORDER BY ?name""",
    ).collect()
    page = execute(
        graph,
        """PREFIX ex: <http://example.org/>
        SELECT DISTINCT ?name WHERE { ?n a ex:Nation . ?n ex:name ?name . }
        ORDER BY ?name LIMIT 5 OFFSET 10""",
    ).collect()
    assert [r["name"] for r in page] == [r["name"] for r in all_rows[10:15]]
