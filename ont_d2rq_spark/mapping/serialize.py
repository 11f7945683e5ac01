"""Serialize a Mapping back to d2rq Turtle.

The reference's MappingGenerator writes a .ttl mapping file (mapgen/
MappingGenerator.java); this is the matching writer so
generate_mapping() output can be saved, diffed against golden files,
hand-edited, and re-loaded with mapping/ttl.py (round-trip tested)."""

from __future__ import annotations

from ont_d2rq_spark.mapping.model import Mapping

D2RQ_PREFIX = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"


def _lit(v: str) -> str:
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def _iri(v: str) -> str:
    return f"<{v}>"


def to_ttl(m: Mapping) -> str:
    out = [
        f"@prefix d2rq: <{D2RQ_PREFIX}> .",
        "@prefix map: <#> .",
        "",
    ]

    db = m.database
    lines = ["map:database a d2rq:Database"]
    if db.result_size_limit is not None:
        lines.append(f"    d2rq:resultSizeLimit {_lit(db.result_size_limit)}")
    for sql in db.startup_sql:
        lines.append(f"    d2rq:startupSQLScript {_lit(sql)}")
    type_prop = {
        "string": "textColumn",
        "long": "numericColumn",
        "integer": "numericColumn",
        "boolean": "booleanColumn",
        "date": "dateColumn",
        "timestamp": "timestampColumn",
        "binary": "binaryColumn",
    }
    for col, xsd in db.column_types.items():
        if xsd in type_prop:
            lines.append(f"    d2rq:{type_prop[xsd]} {_lit(col)}")
    out.append(" ;\n".join(lines) + " .\n")

    for tt in {id(t): t for t in m.translation_tables.values()}.values():
        lines = [f"map:{tt.name} a d2rq:TranslationTable"]
        if tt.href:
            lines.append(f"    d2rq:href {_lit(tt.href)}")
        out.append(" ;\n".join(lines) + " .\n")
        if tt.translations:
            out.append(
                f"# NOTE map:{tt.name}: inline translations omitted from ttl "
                "(bnode syntax); reload via the YAML dialect or d2rq:href.\n"
            )

    for cm in m.class_maps.values():
        lines = [f"map:{cm.name} a d2rq:ClassMap", "    d2rq:dataStorage map:database"]
        if cm.uri_pattern:
            lines.append(f"    d2rq:uriPattern {_lit(cm.uri_pattern)}")
        if cm.uri_column:
            lines.append(f"    d2rq:uriColumn {_lit(cm.uri_column)}")
        if cm.uri_sql_expression:
            lines.append(f"    d2rq:uriSqlExpression {_lit(cm.uri_sql_expression)}")
        if cm.bnode_id_columns:
            lines.append(f"    d2rq:bNodeIdColumns {_lit(','.join(cm.bnode_id_columns))}")
        if cm.constant_value:
            lines.append(f"    d2rq:constantValue {_iri(cm.constant_value)}")
        for cls in cm.classes:
            lines.append(f"    d2rq:class {_iri(cls)}")
        if cm.condition:
            lines.append(f"    d2rq:condition {_lit(cm.condition)}")
        for a in cm.alias:
            lines.append(f"    d2rq:alias {_lit(a)}")
        for j in cm.join:
            op = j.direction or "="
            lines.append(f"    d2rq:join {_lit(f'{j.left} {op} {j.right}')}")
        if cm.contains_duplicates:
            lines.append('    d2rq:containsDuplicates "true"')
        if cm.translate_with:
            lines.append(f"    d2rq:translateWith map:{cm.translate_with}")
        if cm.class_definition_label:
            lines.append(f"    d2rq:classDefinitionLabel {_lit(cm.class_definition_label)}")
        out.append(" ;\n".join(lines) + " .\n")

    for pb in m.bridges:
        safe = pb.name.replace(".", "_")
        lines = [
            f"map:{safe} a d2rq:PropertyBridge",
            f"    d2rq:belongsToClassMap map:{pb.belongs_to_class_map}",
        ]
        for p in pb.properties:
            lines.append(f"    d2rq:property {_iri(p)}")
        if pb.dynamic_property:
            lines.append(f"    d2rq:dynamicProperty {_lit(pb.dynamic_property)}")
        for attr, prop, kind in [
            ("column", "column", "lit"),
            ("pattern", "pattern", "lit"),
            ("sql_expression", "sqlExpression", "lit"),
            ("uri_column", "uriColumn", "lit"),
            ("uri_pattern", "uriPattern", "lit"),
            ("uri_sql_expression", "uriSqlExpression", "lit"),
            ("datatype", "datatype", "iri"),
            ("lang", "lang", "lit"),
            ("condition", "condition", "lit"),
            ("value_regex", "valueRegex", "lit"),
            ("value_contains", "valueContains", "lit"),
        ]:
            v = getattr(pb, attr)
            if v:
                lines.append(
                    f"    d2rq:{prop} " + (_iri(v) if kind == "iri" else _lit(v))
                )
        if pb.bnode_id_columns:
            lines.append(f"    d2rq:bNodeIdColumns {_lit(','.join(pb.bnode_id_columns))}")
        if pb.refers_to_class_map:
            lines.append(f"    d2rq:refersToClassMap map:{pb.refers_to_class_map}")
        if pb.constant_value:
            lines.append(f"    d2rq:constantValue {_iri(pb.constant_value)}")
        if pb.translate_with:
            lines.append(f"    d2rq:translateWith map:{pb.translate_with}")
        for j in pb.join:
            op = j.direction or "="
            lines.append(f"    d2rq:join {_lit(f'{j.left} {op} {j.right}')}")
        for a in pb.alias:
            lines.append(f"    d2rq:alias {_lit(a)}")
        if pb.limit is not None:
            lines.append(f"    d2rq:limit {pb.limit}")
        if pb.limit_inverse is not None:
            lines.append(f"    d2rq:limitInverse {pb.limit_inverse}")
        if pb.order_column:
            prop = "orderDesc" if pb.order_desc else "orderAsc"
            lines.append(f"    d2rq:{prop} {_lit(pb.order_column)}")
        if pb.value_max_length is not None:
            lines.append(f"    d2rq:valueMaxLength {pb.value_max_length}")
        out.append(" ;\n".join(lines) + " .\n")

    for dm in m.download_maps.values():
        lines = [
            f"map:{dm.name} a d2rq:DownloadMap",
            f"    d2rq:uriPattern {_lit(dm.uri_pattern)}",
            f"    d2rq:contentDownloadColumn {_lit(dm.content_column)}",
        ]
        if dm.media_type:
            lines.append(f"    d2rq:mediaType {_lit(dm.media_type)}")
        if dm.condition:
            lines.append(f"    d2rq:condition {_lit(dm.condition)}")
        out.append(" ;\n".join(lines) + " .\n")

    return "\n".join(out)
