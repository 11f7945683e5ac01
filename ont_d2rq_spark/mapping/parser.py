"""Mapping loader — YAML dialect mirroring the d2rq: Turtle vocabulary.

The analogue of parser/MapParser.java (+ vocab/D2RQ.java constants):
instead of parsing Turtle we accept a YAML/dict document whose keys are
the d2rq: property local names (camelCase, exactly as in the mapping
language) and build the typed model of mapping/model.py.  Unknown keys
raise MappingError — the same strictness the reference applies to
unknown d2rq: properties.

Example::

    base_iri: "http://example.org/"
    database:
      base_dir: /root/testdata/sf0.001
    class_maps:
      customer:
        table: customer
        uriPattern: "http://example.org/customer/@@customer.c_custkey@@"
        class: "http://example.org/Customer"
        bridges:
          name:
            property: "http://example.org/name"
            column: customer.c_name
          nation:
            property: "http://example.org/nation"
            refersToClassMap: nation
            join: "customer.c_nationkey => nation.n_nationkey"
"""

from __future__ import annotations

from typing import Any

from ont_d2rq_spark.mapping.model import (
    ClassMap,
    Configuration,
    Database,
    DownloadMap,
    Join,
    Mapping,
    MappingError,
    PropertyBridge,
    TranslationTable,
)

_CM_KEYS = {
    "table": "table",
    "uriPattern": "uri_pattern",
    "uriColumn": "uri_column",
    "uriSqlExpression": "uri_sql_expression",
    "bNodeIdColumns": "bnode_id_columns",
    "constantValue": "constant_value",
    "class": "classes",
    "condition": "condition",
    "alias": "alias",
    "join": "join",
    "containsDuplicates": "contains_duplicates",
    "translateWith": "translate_with",
    "classDefinitionLabel": "class_definition_label",
    "comment": "comment",
}

_PB_KEYS = {
    "property": "properties",
    "dynamicProperty": "dynamic_property",
    "column": "column",
    "pattern": "pattern",
    "sqlExpression": "sql_expression",
    "uriColumn": "uri_column",
    "uriPattern": "uri_pattern",
    "uriSqlExpression": "uri_sql_expression",
    "bNodeIdColumns": "bnode_id_columns",
    "refersToClassMap": "refers_to_class_map",
    "constantValue": "constant_value",
    "constantIsLiteral": "constant_is_literal",
    "datatype": "datatype",
    "lang": "lang",
    "translateWith": "translate_with",
    "join": "join",
    "condition": "condition",
    "alias": "alias",
    "limit": "limit",
    "limitInverse": "limit_inverse",
    "orderAsc": "order_column",
    "orderDesc": "order_column",
    "valueRegex": "value_regex",
    "valueContains": "value_contains",
    "valueMaxLength": "value_max_length",
}

_LIST_KEYS = {"classes", "alias", "properties", "bnode_id_columns"}


def _as_list(v: Any) -> list:
    if v is None:
        return []
    if isinstance(v, str):
        # bNodeIdColumns is comma-separated in d2rq
        return [p.strip() for p in v.split(",")] if "," in v else [v]
    return list(v)


def _joins(v: Any) -> list[Join]:
    return [Join.parse(j) if isinstance(j, str) else j for j in _as_list(v)]


def _build_class_map(name: str, spec: dict) -> tuple[ClassMap, dict]:
    kwargs: dict[str, Any] = {"name": name}
    bridges = spec.get("bridges", {}) or {}
    for k, v in spec.items():
        if k == "bridges":
            continue
        if k not in _CM_KEYS:
            raise MappingError(f"ClassMap {name!r}: unknown d2rq key {k!r}")
        f = _CM_KEYS[k]
        if f == "join":
            kwargs[f] = _joins(v)
        elif f in _LIST_KEYS:
            kwargs[f] = _as_list(v)
        else:
            kwargs[f] = v
    return ClassMap(**kwargs), bridges


def _build_bridge(name: str, cm_name: str, spec: dict) -> PropertyBridge:
    kwargs: dict[str, Any] = {"name": name, "belongs_to_class_map": cm_name}
    for k, v in spec.items():
        if k not in _PB_KEYS:
            raise MappingError(f"PropertyBridge {name!r}: unknown d2rq key {k!r}")
        f = _PB_KEYS[k]
        if f == "join":
            kwargs[f] = _joins(v)
        elif f in _LIST_KEYS:
            kwargs[f] = _as_list(v)
        else:
            kwargs[f] = v
    if spec.get("orderDesc"):
        kwargs["order_desc"] = True
    return PropertyBridge(**kwargs)


def load_mapping_dict(doc: dict) -> Mapping:
    db_spec = dict(doc.get("database", {}) or {})
    db = Database(
        name=db_spec.pop("name", "db"),
        base_dir=db_spec.pop("base_dir", None),
        tables=db_spec.pop("tables", {}) or {},
        table_formats=db_spec.pop("table_formats", {}) or {},
        table_options=db_spec.pop("table_options", {}) or {},
        table_schemas=db_spec.pop("table_schemas", {}) or {},
        column_types=db_spec.pop("column_types", {}) or {},
        startup_sql=_as_list(db_spec.pop("startupSQLScript", None)),
        result_size_limit=db_spec.pop("resultSizeLimit", None),
        fetch_size=db_spec.pop("fetchSize", None),
    )
    if db_spec:
        raise MappingError(f"database: unknown keys {sorted(db_spec)}")

    cfg_spec = doc.get("configuration", {}) or {}
    cfg = Configuration(
        serve_vocabulary=cfg_spec.get("serveVocabulary", True),
        use_all_optimizations=cfg_spec.get("useAllOptimizations", True),
        control_owl=cfg_spec.get("controlOWL", False),
    )

    m = Mapping(database=db, configuration=cfg, base_iri=doc.get("base_iri", ""))

    for tname, tspec in (doc.get("translation_tables", {}) or {}).items():
        m.translation_tables[tname] = TranslationTable(
            name=tname,
            translations=tspec.get("translations", {}) or {},
            href=tspec.get("href"),
        )

    for dname, dspec in (doc.get("download_maps", {}) or {}).items():
        m.download_maps[dname] = DownloadMap(
            name=dname,
            table=dspec["table"],
            uri_pattern=dspec["uriPattern"],
            content_column=dspec["contentDownloadColumn"],
            media_type=dspec.get("mediaType"),
            condition=dspec.get("condition"),
        )

    for cm_name, cm_spec in (doc.get("class_maps", {}) or {}).items():
        cm, bridge_specs = _build_class_map(cm_name, cm_spec or {})
        m.add_class_map(cm)
        for b_name, b_spec in bridge_specs.items():
            m.add_bridge(_build_bridge(f"{cm_name}.{b_name}", cm_name, b_spec or {}))

    m.validate()
    return m


def load_mapping(path: str) -> Mapping:
    import yaml

    with open(path) as f:
        return load_mapping_dict(yaml.safe_load(f))
