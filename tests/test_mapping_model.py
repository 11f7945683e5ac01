"""Mapping model + parser validation (reference: MapParser/MappingTest-style)."""

import pytest

from ont_d2rq_spark.mapping.model import (
    ClassMap,
    Join,
    Mapping,
    MappingError,
    PropertyBridge,
    TranslationTable,
)
from ont_d2rq_spark.mapping.parser import load_mapping_dict


def test_classmap_requires_exactly_one_maker():
    with pytest.raises(MappingError):
        ClassMap(name="x", table="t")
    with pytest.raises(MappingError):
        ClassMap(name="x", table="t", uri_pattern="a@@t.c@@", uri_column="t.c")


def test_bridge_requires_object_maker_and_property():
    with pytest.raises(MappingError):
        PropertyBridge(name="b", belongs_to_class_map="x", properties=["p"])
    with pytest.raises(MappingError):
        PropertyBridge(name="b", belongs_to_class_map="x", column="t.c")


def test_join_parse_directions():
    j = Join.parse("a.x => b.y")
    assert (j.left, j.right, j.direction) == ("a.x", "b.y", "=>")
    assert Join.parse("a.x = b.y").direction is None
    with pytest.raises(MappingError):
        Join.parse("nonsense")


def test_validate_unknown_classmap_ref():
    m = Mapping()
    m.add_class_map(ClassMap(name="c", table="t", uri_pattern="u@@t.k@@"))
    m.add_bridge(
        PropertyBridge(
            name="b", belongs_to_class_map="c", properties=["p"], refers_to_class_map="zzz"
        )
    )
    with pytest.raises(MappingError):
        m.validate()


def test_refers_across_tables_needs_join():
    m = Mapping()
    m.add_class_map(ClassMap(name="a", table="ta", uri_pattern="u@@ta.k@@"))
    m.add_class_map(ClassMap(name="b", table="tb", uri_pattern="v@@tb.k@@"))
    m.add_bridge(
        PropertyBridge(
            name="x", belongs_to_class_map="a", properties=["p"], refers_to_class_map="b"
        )
    )
    with pytest.raises(MappingError):
        m.validate()


def test_translation_table_csv(tmp_path):
    f = tmp_path / "tt.csv"
    f.write_text("db1,rdf1\ndb2,rdf2\n")
    tt = TranslationTable(name="t", href=str(f))
    assert tt.load_pairs() == {"db1": "rdf1", "db2": "rdf2"}
    assert tt.to_db_value("rdf2") == "db2"
    assert tt.to_db_value("nope") is None


def test_yaml_dialect_loader():
    doc = {
        "base_iri": "http://ex/",
        "database": {"base_dir": "/tmp"},
        "class_maps": {
            "c": {
                "table": "t",
                "uriPattern": "http://ex/@@t.k@@",
                "class": "http://ex/C",
                "bridges": {
                    "name": {"property": "http://ex/name", "column": "t.n", "lang": "en"},
                    "ref": {
                        "property": "http://ex/r",
                        "refersToClassMap": "d",
                        "join": "t.fk => u.pk",
                    },
                },
            },
            "d": {"table": "u", "uriPattern": "http://ex/d/@@u.pk@@"},
        },
    }
    m = load_mapping_dict(doc)
    assert set(m.class_maps) == {"c", "d"}
    assert len(m.bridges) == 2
    ref = [b for b in m.bridges if b.refers_to_class_map][0]
    assert ref.join[0].direction == "=>"


def test_yaml_unknown_key_rejected():
    doc = {
        "class_maps": {
            "c": {"table": "t", "uriPattern": "u@@t.k@@", "bogusKey": 1}
        }
    }
    with pytest.raises(MappingError):
        load_mapping_dict(doc)
