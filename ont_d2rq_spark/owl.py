"""OWL-axiom surface — the ont-d2rq ONT-API layer analogue.

The reference wraps the virtual graph as an OWL-API document source
(public layout: ru.avicomp.ontapi.D2RQGraphDocumentSource +
OntologyModel over the mapping's schema graph — SURVEY.md §3 E3), so
OWL tooling can load the mapped database as an ontology.  Here the
same surface is served three ways, all derived from the mapping object
model (the vocabulary is static and tiny — driver-built, no cluster
work):

  * :func:`axioms` — typed axiom tuples (the OWLAxiom stream an
    OWL-API consumer iterates);
  * :func:`axioms_df` — the same as a DataFrame, GRAPH-queryable next
    to the vocabulary triple graph (schema_graph.py S8);
  * :func:`to_functional_syntax` — an OWL 2 Functional-Syntax document
    (the serialization OWL-API loads losslessly), so "switching from
    the reference" preserves the ontology-document workflow.

Axiom coverage mirrors what the reference can actually derive from a
D2RQ mapping: entity declarations, property domains/ranges, and label
annotation assertions.  Nothing richer (SubClassOf, restrictions) is
derivable from a mapping, and the reference emits none.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ont_d2rq_spark import OWL, RDF_TYPE, RDFS
from ont_d2rq_spark.mapping.model import Mapping
from ont_d2rq_spark.schema_graph import schema_rows

AXIOM_SCHEMA = "axiom string, subject string, object string"


@dataclass(frozen=True)
class Axiom:
    """One OWL axiom: kind + subject entity + optional object/value."""

    kind: str  # e.g. "Declaration(Class)", "ObjectPropertyDomain"
    subject: str
    obj: str | None = None

    def functional(self) -> str:
        if self.kind == "Declaration(Class)":
            return f"Declaration(Class(<{self.subject}>))"
        if self.kind == "Declaration(ObjectProperty)":
            return f"Declaration(ObjectProperty(<{self.subject}>))"
        if self.kind == "Declaration(DataProperty)":
            return f"Declaration(DataProperty(<{self.subject}>))"
        if self.kind == "AnnotationAssertion(rdfs:label)":
            lit = str(self.obj).replace("\\", "\\\\").replace('"', '\\"')
            return (
                f"AnnotationAssertion(rdfs:label <{self.subject}> "
                f'"{lit}")'
            )
        # domain/range forms: ObjectPropertyDomain(<p> <c>) etc.
        return f"{self.kind}(<{self.subject}> <{self.obj}>)"


def axioms(mapping: Mapping) -> list[Axiom]:
    """Derive the OWL axiom list from the mapping's schema graph —
    deterministic order (sorted), duplicates collapsed."""
    out: set[Axiom] = set()
    for s, p, o, _dt, _lang, is_lit in schema_rows(mapping):
        if p == RDF_TYPE and o == OWL + "Class":
            out.add(Axiom("Declaration(Class)", s))
        elif p == RDF_TYPE and o == OWL + "ObjectProperty":
            out.add(Axiom("Declaration(ObjectProperty)", s))
        elif p == RDF_TYPE and o == OWL + "DatatypeProperty":
            out.add(Axiom("Declaration(DataProperty)", s))
        elif p == RDFS + "label" and is_lit:
            out.add(Axiom("AnnotationAssertion(rdfs:label)", s, o))
    # domains/ranges need the property kind to pick the OWL axiom form
    kinds = {a.subject: a.kind for a in out if a.kind.startswith("Declaration(")}
    for s, p, o, _dt, _lang, _il in schema_rows(mapping):
        if p == RDFS + "domain":
            form = (
                "DataPropertyDomain"
                if kinds.get(s) == "Declaration(DataProperty)"
                else "ObjectPropertyDomain"
            )
            out.add(Axiom(form, s, o))
        elif p == RDFS + "range":
            form = (
                "DataPropertyRange"
                if kinds.get(s) == "Declaration(DataProperty)"
                else "ObjectPropertyRange"
            )
            out.add(Axiom(form, s, o))
    return sorted(out, key=lambda a: (a.kind, a.subject, a.obj or ""))


def axioms_df(mapping: Mapping, spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(a.kind, a.subject, a.obj) for a in axioms(mapping)], AXIOM_SCHEMA
    )


def to_functional_syntax(mapping: Mapping, ontology_iri: str | None = None) -> str:
    """OWL 2 Functional-Syntax document for the mapping's vocabulary —
    loadable by any OWL-API/ONT-API consumer, replacing the reference's
    D2RQGraphDocumentSource hand-off."""
    iri = (ontology_iri or mapping.base_iri or "urn:x-d2rq:ontology").rstrip("/#")
    lines = [
        "Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)",
        "Prefix(owl:=<http://www.w3.org/2002/07/owl#>)",
        f"Ontology(<{iri}>",
    ]
    lines += [a.functional() for a in axioms(mapping)]
    lines.append(")")
    return "\n".join(lines) + "\n"
