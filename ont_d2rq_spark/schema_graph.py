"""Schema / vocabulary graph — ont-d2rq's OWL vocabulary served with data.

Reference: ont-d2rq map/impl/schema/* (SURVEY.md §2.1 S8, conf M): an OWL
vocabulary (classes, properties, domains, labels) is DERIVED from the
mapping object model and unioned with the data graph when
d2rq:serveVocabulary is true.  The vocabulary is tiny and static, so it
is built driver-side and becomes a small literal DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ont_d2rq_spark import OWL, RDF_TYPE, RDFS, XSD
from ont_d2rq_spark.compiler.relation import TRIPLE_SCHEMA
from ont_d2rq_spark.mapping.model import Mapping


def schema_rows(mapping: Mapping) -> list[tuple]:
    rows: list[tuple] = []

    def uri_triple(s, p, o):
        rows.append((s, p, o, None, None, False))

    def lit_triple(s, p, o):
        rows.append((s, p, o, None, None, True))

    classes = sorted({c for cm in mapping.class_maps.values() for c in cm.classes})
    for cls in classes:
        uri_triple(cls, RDF_TYPE, OWL + "Class")
    for cm in mapping.class_maps.values():
        if cm.class_definition_label:
            for cls in cm.classes:
                lit_triple(cls, RDFS + "label", cm.class_definition_label)
    for pb in mapping.bridges:
        cm = mapping.class_maps.get(pb.belongs_to_class_map)
        kind = (
            OWL + "ObjectProperty" if not pb.object_is_literal else OWL + "DatatypeProperty"
        )
        for prop in pb.properties:
            uri_triple(prop, RDF_TYPE, kind)
            if cm and cm.classes:
                uri_triple(prop, RDFS + "domain", cm.classes[0])
            if pb.refers_to_class_map:
                tgt = mapping.class_maps[pb.refers_to_class_map]
                if tgt.classes:
                    uri_triple(prop, RDFS + "range", tgt.classes[0])
            elif pb.datatype:
                uri_triple(prop, RDFS + "range", pb.datatype)
    # deterministic order, exact-set semantics for fixtures
    return sorted(set(rows))


def schema_triples(mapping: Mapping, spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(schema_rows(mapping), TRIPLE_SCHEMA)
