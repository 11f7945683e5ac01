"""Mapping → Turtle → Mapping round trip (MappingGenerator writer parity)."""

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.mapping.serialize import to_ttl
from ont_d2rq_spark.mapping.ttl import load_mapping_ttl


def test_roundtrip_tpch_mapping():
    m1 = tpch_mapping("/root/testdata/sf0.001")
    ttl = to_ttl(m1)
    m2 = load_mapping_ttl(ttl, base_dir="/root/testdata/sf0.001")
    assert set(m2.class_maps) == set(m1.class_maps)
    for name, cm1 in m1.class_maps.items():
        cm2 = m2.class_maps[name]
        assert cm2.uri_pattern == cm1.uri_pattern
        assert cm2.classes == cm1.classes
        assert cm2.condition == cm1.condition
        assert (cm2.bnode_id_columns or None) == (cm1.bnode_id_columns or None)
    # bridge multiset matches on the semantic fields (names are
    # dot→underscore mangled by ttl identifiers)
    def key(pb):
        return (
            pb.belongs_to_class_map,
            tuple(pb.properties),
            pb.dynamic_property,
            pb.column,
            pb.sql_expression,
            pb.refers_to_class_map,
            tuple((j.left, j.right, j.direction) for j in pb.join),
            pb.lang,
            pb.datatype,
        )

    assert sorted(map(key, m2.bridges)) == sorted(map(key, m1.bridges))
    # translation table reference survives (pairs live outside ttl)
    seg = [b for b in m2.bridges if b.translate_with]
    assert seg and seg[0].translate_with == "segments"
