"""Turtle dump (dump-rdf --format TURTLE parity, SURVEY §2.1 S6)."""

import glob
import re

import pytest

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph

SF = "/root/testdata/sf0.001"
EX = "http://example.org/"


@pytest.fixture(scope="module")
def graph(spark):
    return VirtualGraph(tpch_mapping(SF), spark)


def test_ttl_lines_groups_and_prefixes(graph):
    rows = graph.ttl_lines().collect()
    lines = [r["line"] for r in rows]
    # one block per subject, every block terminated
    assert all(l.endswith(" .") for l in lines)
    n_subjects = graph.triples(distinct=True).select("subj").distinct().count()
    assert len(lines) == n_subjects
    # pairs across blocks == distinct triples (collect_set dedups)
    n_pairs = sum(l.count(" ; ") + 1 for l in lines)
    n_triples = (
        graph.triples(distinct=True).count()
    )
    assert n_pairs == n_triples
    joined = "\n".join(lines)
    # prefix compaction applied where PN_LOCAL-safe; slashes keep <…>
    assert "ex:name" in joined and "ex:Customer" in joined
    assert "<http://example.org/name>" not in joined
    assert f"<{EX}customer/7>" in joined
    # rdf:type renders as 'a'
    assert re.search(r" a ex:Customer", joined)
    # typed and lang-tagged literals render in Turtle form
    assert re.search(r'"[^"]*"\^\^xsd:', joined) or "^^<" in joined
    assert re.search(r'"[^"]*"@[A-Za-z-]+', joined)


def test_dump_ttl_concat_is_valid_document(graph, tmp_path):
    out = str(tmp_path / "ttl")
    graph.dump_ttl(out)
    files = sorted(glob.glob(out + "/_prefixes.ttl") + glob.glob(out + "/part-*"))
    assert files and files[0].endswith("_prefixes.ttl")  # header sorts first
    doc = "".join(open(f).read() for f in files)
    assert doc.startswith("@prefix ")
    assert "@prefix ex: <http://example.org/> ." in doc
    # every non-header line is a well-formed subject block
    body = [
        l for l in doc.splitlines() if l and not l.startswith("@prefix")
    ]
    assert all(l.endswith(" .") for l in body)
    # expand prefixed terms back and compare the triple count with NT
    n_pairs = sum(l.count(" ; ") + 1 for l in body)
    assert n_pairs == graph.triples(distinct=True).count()


def test_ttl_overlapping_prefixes_longest_wins(graph, spark):
    """With overlapping namespaces the LONGEST matching namespace must
    own the local part — shortest-first would serialize …/voc2/x as
    v:2x (wrong prefix attachment)."""
    t = spark.createDataFrame(
        [
            ("http://ex.org/voc2/x", "http://ex.org/voc/p", "http://ex.org/voc2/y",
             None, None, False),
        ],
        "subj string, pred string, obj string, obj_datatype string, obj_lang string, is_literal boolean",
    )
    lines = [
        r["line"]
        for r in graph.ttl_lines(
            t, prefixes={"v": "http://ex.org/voc/", "v2": "http://ex.org/voc2/"}
        ).collect()
    ]
    assert lines == ["v2:x v:p v2:y ."]


def test_cli_dump_turtle(tmp_path, capsys):
    import tempfile

    from ont_d2rq_spark.cli import main
    from ont_d2rq_spark.mapping.serialize import to_ttl

    f = tempfile.NamedTemporaryFile(mode="w", suffix=".ttl", delete=False)
    f.write(to_ttl(tpch_mapping(SF)))
    f.close()
    out = str(tmp_path / "dump")
    assert (
        main(["dump-rdf", "-m", f.name, "-d", SF, "-o", out, "--format", "turtle"])
        == 0
    )
    assert glob.glob(out + "/_prefixes.ttl")
