"""Canonical mappings over the driver test tables.

``tpch_mapping(sf_dir)`` plays the role of the reference's ISWC example
mapping (doc/example/mapping-iswc.ttl): it exercises every mapping
feature over the star schema in /root/testdata (FIXTURES.md §1) —
uriPattern mint, refersToClassMap joins with FK direction hints,
conditions, translation tables, sqlExpression, dynamic properties,
blank nodes, datatype/lang literals, order/limit.
"""

from __future__ import annotations

from ont_d2rq_spark.mapping.model import (
    ClassMap,
    Database,
    Join,
    Mapping,
    PropertyBridge,
    TranslationTable,
)

EX = "http://example.org/"

MKTSEGMENT_TRANSLATIONS = {
    "AUTOMOBILE": EX + "segment/automobile",
    "BUILDING": EX + "segment/building",
    "FURNITURE": EX + "segment/furniture",
    "HOUSEHOLD": EX + "segment/household",
    "MACHINERY": EX + "segment/machinery",
}


def tpch_mapping(sf_dir: str) -> Mapping:
    db = Database(base_dir=sf_dir)
    m = Mapping(database=db, base_iri=EX)
    m.translation_tables["segments"] = TranslationTable(
        name="segments", translations=MKTSEGMENT_TRANSLATIONS
    )

    m.add_class_map(
        ClassMap(
            name="region",
            table="region",
            uri_pattern=EX + "region/@@region.r_regionkey@@",
            classes=[EX + "Region"],
            class_definition_label="region",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="region.name",
            belongs_to_class_map="region",
            properties=[EX + "name"],
            column="region.r_name",
        )
    )

    m.add_class_map(
        ClassMap(
            name="nation",
            table="nation",
            uri_pattern=EX + "nation/@@nation.n_nationkey@@",
            classes=[EX + "Nation"],
            class_definition_label="nation",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="nation.name",
            belongs_to_class_map="nation",
            properties=[EX + "name"],
            column="nation.n_name",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="nation.region",
            belongs_to_class_map="nation",
            properties=[EX + "inRegion"],
            refers_to_class_map="region",
            join=[Join("nation.n_regionkey", "region.r_regionkey", "=>")],
        )
    )

    m.add_class_map(
        ClassMap(
            name="customer",
            table="customer",
            uri_pattern=EX + "customer/@@customer.c_custkey@@",
            classes=[EX + "Customer"],
            class_definition_label="customer",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="customer.name",
            belongs_to_class_map="customer",
            properties=[EX + "name"],
            column="customer.c_name",
            lang="en",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="customer.acctbal",
            belongs_to_class_map="customer",
            properties=[EX + "acctbal"],
            column="customer.c_acctbal",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="customer.segment",
            belongs_to_class_map="customer",
            properties=[EX + "marketSegment"],
            uri_column="customer.c_mktsegment",
            translate_with="segments",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="customer.display",
            belongs_to_class_map="customer",
            properties=[EX + "display"],
            # d2rq:pattern literal (F1 in literal position)
            pattern="Customer @@customer.c_custkey@@ (@@customer.c_mktsegment@@)",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="customer.nation",
            belongs_to_class_map="customer",
            properties=[EX + "inNation"],
            refers_to_class_map="nation",
            join=[Join("customer.c_nationkey", "nation.n_nationkey", "=>")],
        )
    )

    m.add_class_map(
        ClassMap(
            name="supplier",
            table="supplier",
            uri_pattern=EX + "supplier/@@supplier.s_suppkey@@",
            classes=[EX + "Supplier"],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="supplier.name",
            belongs_to_class_map="supplier",
            properties=[EX + "name"],
            column="supplier.s_name",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="supplier.nation",
            belongs_to_class_map="supplier",
            properties=[EX + "inNation"],
            refers_to_class_map="nation",
            join=[Join("supplier.s_nationkey", "nation.n_nationkey", "=>")],
        )
    )

    m.add_class_map(
        ClassMap(
            name="part",
            table="part",
            uri_pattern=EX + "part/@@part.p_partkey@@",
            classes=[EX + "Part"],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="part.name",
            belongs_to_class_map="part",
            properties=[EX + "name"],
            column="part.p_name",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="part.brand_dyn",
            belongs_to_class_map="part",
            # dynamic property (F7): predicate minted per row
            dynamic_property=EX + "brand/@@part.p_brand|urlify@@",
            column="part.p_size",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="part.retail_expr",
            belongs_to_class_map="part",
            properties=[EX + "retailPriceCents"],
            # d2rq:sqlExpression (F4), Spark-SQL dialect per SURVEY §2.2 P2
            sql_expression="CAST(ROUND(part.p_retailprice * 100) AS BIGINT)",
        )
    )

    m.add_class_map(
        ClassMap(
            name="orders",
            table="orders",
            uri_pattern=EX + "order/@@orders.o_orderkey@@",
            classes=[EX + "Order"],
            # d2rq:condition fixture (P2): only non-pending orders
            condition="orders.o_orderstatus <> 'P'",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="orders.customer",
            belongs_to_class_map="orders",
            properties=[EX + "placedBy"],
            refers_to_class_map="customer",
            join=[Join("orders.o_custkey", "customer.c_custkey", "=>")],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="orders.totalprice",
            belongs_to_class_map="orders",
            properties=[EX + "totalPrice"],
            column="orders.o_totalprice",
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="orders.orderdate",
            belongs_to_class_map="orders",
            properties=[EX + "orderDate"],
            sql_expression="date_format(orders.o_orderdate, 'yyyy-MM-dd')",
            datatype="http://www.w3.org/2001/XMLSchema#date",
        )
    )

    # lineitem: composite key → blank node (F3)
    m.add_class_map(
        ClassMap(
            name="lineitem",
            table="lineitem",
            bnode_id_columns=["lineitem.l_orderkey", "lineitem.l_linenumber"],
            classes=[EX + "LineItem"],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="lineitem.order",
            belongs_to_class_map="lineitem",
            properties=[EX + "ofOrder"],
            refers_to_class_map="orders",
            join=[Join("lineitem.l_orderkey", "orders.o_orderkey", "=>")],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="lineitem.part",
            belongs_to_class_map="lineitem",
            properties=[EX + "ofPart"],
            refers_to_class_map="part",
            join=[Join("lineitem.l_partkey", "part.p_partkey", "=>")],
        )
    )
    m.add_bridge(
        PropertyBridge(
            name="lineitem.quantity",
            belongs_to_class_map="lineitem",
            properties=[EX + "quantity"],
            column="lineitem.l_quantity",
        )
    )
    m.validate()
    return m
