"""OWL-axiom surface (ONT-API layer analogue, SURVEY §3 E3)."""

import re

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.owl import axioms, axioms_df, to_functional_syntax
from ont_d2rq_spark.schema_graph import schema_rows

SF = "/root/testdata/sf0.001"
EX = "http://example.org/"


def test_axioms_cover_schema_graph():
    m = tpch_mapping(SF)
    ax = axioms(m)
    kinds = {}
    for a in ax:
        kinds.setdefault(a.kind, []).append(a)
    # every mapped class declared
    classes = {c for cm in m.class_maps.values() for c in cm.classes}
    assert {a.subject for a in kinds["Declaration(Class)"]} == classes
    # properties split by literal-ness, each declared exactly once
    decls = kinds["Declaration(ObjectProperty)"] + kinds["Declaration(DataProperty)"]
    assert len(decls) == len({a.subject for a in decls})
    # ObjectProperty ranges point at classes, DataProperty ranges at datatypes
    for a in kinds.get("ObjectPropertyRange", []):
        assert a.obj in classes
    for a in kinds.get("DataPropertyRange", []):
        assert "XMLSchema#" in a.obj
    # axiom list is a faithful projection of the schema triple graph:
    # every domain/range triple appears as an axiom
    n_dom_rng = sum(
        1 for s, p, o, *_ in schema_rows(m) if p.endswith(("domain", "range"))
    )
    n_ax_dom_rng = sum(1 for a in ax if "Domain" in a.kind or "Range" in a.kind)
    assert n_ax_dom_rng == n_dom_rng


def test_axioms_deterministic_and_df(spark):
    m = tpch_mapping(SF)
    assert axioms(m) == axioms(m)
    df = axioms_df(m, spark)
    assert df.count() == len(axioms(m))
    assert df.columns == ["axiom", "subject", "object"]


def test_functional_syntax_document():
    m = tpch_mapping(SF)
    doc = to_functional_syntax(m)
    assert doc.startswith("Prefix(")
    assert re.search(r"Ontology\(<[^>]+>", doc)
    assert f"Declaration(Class(<{EX}Customer>))" in doc
    assert re.search(
        rf"ObjectPropertyDomain\(<{EX}inNation> <{EX}(Customer|Supplier)>\)", doc
    )
    # balanced: one closing paren line at the end
    assert doc.rstrip().endswith(")")
    # every axiom line inside the Ontology block is well-formed
    body = doc.split("Ontology(", 1)[1]
    for line in body.splitlines()[1:-1]:
        assert re.match(r"^[A-Za-z]+\(", line), line
