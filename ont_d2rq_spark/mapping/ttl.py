"""Turtle loader for real d2rq:* mapping files.

The analogue of parser/MapParser.java over the actual D2RQ mapping
language: a user of the reference can point this at their existing
mapping-*.ttl and get the same Mapping object the YAML dialect builds.

Scope: the Turtle subset the d2rq: vocabulary uses — @prefix, triple
statements with `;` predicate lists and `,` object lists, IRIs,
prefixed names, `a`, string literals (quoted/long-quoted, with
@lang / ^^datatype), numbers, booleans.  No collections/blank-node
property lists (the d2rq vocabulary doesn't use them).

Vocabulary handled (vocab/D2RQ.java constants):
  d2rq:Database, ClassMap, PropertyBridge, TranslationTable,
  DownloadMap, Configuration and their properties; jdbc* properties are
  accepted and ignored (parquet catalogs replace JDBC).
"""

from __future__ import annotations

import re
from typing import Optional

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

_TOKEN = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<str>"(?:[^"\\\n]|\\.)*")
  | (?P<iri><[^>]*>)
  | (?P<punct>\^\^|[;,.\[\]()])
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.-]*)
  | (?P<lang>@[A-Za-z][\w-]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<kw>@prefix|@base|a|true|false)
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise MappingError(f"ttl: cannot tokenize at …{text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield m


def _unescape(s: str) -> str:
    return (
        s.replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\r", "\r")
        .replace('\\"', '"')
        .replace("\\\\", "\\")
    )


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokens(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # statements: subject -> predicate(qname or iri) -> [objects]
        self.st: dict[str, dict[str, list]] = {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise MappingError("ttl: unexpected EOF")
        self.i += 1
        return t

    def parse(self):
        while self.peek() is not None:
            t = self.peek()
            if t.group(0) == "@prefix":
                self.next()
                pfx_tok = self.next()  # pname with empty local
                pfx = pfx_tok.group("pname") or ""
                iri = self.next().group("iri")[1:-1]
                self.prefixes[pfx] = iri
                dot = self.next()
                if dot.group(0) != ".":
                    raise MappingError("ttl: expected '.' after @prefix")
            else:
                self.statement()
        return self.st

    def term(self):
        t = self.next()
        g = t.group(0)
        if t.lastgroup == "iri":
            return ("iri", g[1:-1])
        if t.lastgroup == "longstr":
            return ("lit", _unescape(g[3:-3]), None, None)
        if t.lastgroup == "str":
            val = _unescape(g[1:-1])
            nxt = self.peek()
            if nxt is not None and nxt.lastgroup == "lang":
                self.next()
                return ("lit", val, nxt.group(0)[1:], None)
            if nxt is not None and nxt.group(0) == "^^":
                self.next()
                dt = self.term()
                return ("lit", val, None, dt[1])
            return ("lit", val, None, None)
        if t.lastgroup == "num":
            return ("lit", g, None, "number")
        if g in ("true", "false"):
            return ("lit", g, None, "boolean")
        if g == "a":
            return ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        if t.group("local") is not None:
            pfx = t.group("pname") or ""
            if pfx not in self.prefixes:
                raise MappingError(f"ttl: unknown prefix {pfx!r}:")
            return ("iri", self.prefixes[pfx] + t.group("local"))
        raise MappingError(f"ttl: unexpected token {g!r}")

    def statement(self):
        subj = self.term()
        if subj[0] != "iri":
            raise MappingError("ttl: subject must be an IRI in d2rq mappings")
        props = self.st.setdefault(subj[1], {})
        while True:
            pred = self.term()
            if pred[0] != "iri":
                raise MappingError("ttl: predicate must be an IRI")
            while True:
                obj = self.term()
                props.setdefault(pred[1], []).append(obj)
                nxt = self.next()
                if nxt.group(0) == ",":
                    continue
                break
            if nxt.group(0) == ";":
                # allow trailing ';' before '.'
                if self.peek() is not None and self.peek().group(0) == ".":
                    self.next()
                    return
                continue
            if nxt.group(0) == ".":
                return
            raise MappingError(f"ttl: expected ';' ',' or '.', got {nxt.group(0)!r}")


D2RQ = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _local(props: dict, name: str):
    vals = props.get(D2RQ + name, [])
    return vals[0][1] if vals else None


def _locals(props: dict, name: str) -> list[str]:
    return [v[1] for v in props.get(D2RQ + name, [])]


def load_mapping_ttl(path_or_text: str, base_dir: Optional[str] = None) -> Mapping:
    """Parse a d2rq Turtle mapping.  `base_dir` overrides the JDBC
    connection with a parquet table directory (the jdbcDSN etc. in the
    file are accepted and ignored)."""
    text = path_or_text
    if "\n" not in path_or_text and path_or_text.endswith((".ttl", ".n3")):
        with open(path_or_text) as f:
            text = f.read()
    st = _Parser(text).parse()

    def typed(t: str) -> list[tuple[str, dict]]:
        return [
            (s, props)
            for s, props in st.items()
            if any(o[1] == D2RQ + t for o in props.get(RDF_TYPE, []))
        ]

    m = Mapping()
    for _s, props in typed("Database"):
        m.database = Database(
            base_dir=base_dir,
            startup_sql=_locals(props, "startupSQLScript"),
            result_size_limit=int(_local(props, "resultSizeLimit"))
            if _local(props, "resultSizeLimit")
            else None,
        )
        for prop_name, xsd in [
            ("textColumn", "string"),
            ("numericColumn", "long"),
            ("booleanColumn", "boolean"),
            ("dateColumn", "date"),
            ("timestampColumn", "timestamp"),
            ("binaryColumn", "binary"),
        ]:
            for col in _locals(props, prop_name):
                m.database.column_types[col] = xsd
    if base_dir and not m.database.base_dir:
        m.database.base_dir = base_dir

    for s, props in typed("Configuration"):
        m.configuration = Configuration(
            serve_vocabulary=_local(props, "serveVocabulary") != "false",
            use_all_optimizations=_local(props, "useAllOptimizations") != "false",
        )

    for s, props in typed("TranslationTable"):
        name = s.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
        tt = TranslationTable(name=name, href=_local(props, "href"))
        for tr in props.get(D2RQ + "translation", []):
            # inline translations are bnodes in real files — unsupported
            # here; use href CSV or the YAML dialect for inline pairs.
            raise MappingError(
                "ttl: inline d2rq:translation bnodes unsupported — use d2rq:href CSV"
            )
        m.translation_tables[name] = tt
        m.translation_tables[s] = tt  # allow IRI reference

    cm_by_iri: dict[str, str] = {}
    for s, props in typed("ClassMap"):
        name = s.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
        cm_by_iri[s] = name
        bnode_cols = _local(props, "bNodeIdColumns")
        cm = ClassMap(
            name=name,
            uri_pattern=_local(props, "uriPattern"),
            uri_column=_local(props, "uriColumn"),
            uri_sql_expression=_local(props, "uriSqlExpression"),
            bnode_id_columns=[c.strip() for c in bnode_cols.split(",")] if bnode_cols else None,
            constant_value=_local(props, "constantValue"),
            classes=_locals(props, "class"),
            condition=_local(props, "condition"),
            alias=_locals(props, "alias"),
            join=[Join.parse(j) for j in _locals(props, "join")],
            contains_duplicates=_local(props, "containsDuplicates") == "true",
            translate_with=_resolve_tt(m, _local(props, "translateWith")),
            class_definition_label=_local(props, "classDefinitionLabel"),
        )
        m.add_class_map(cm)

    for s, props in typed("PropertyBridge"):
        name = s.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
        belongs = _local(props, "belongsToClassMap")
        if belongs not in cm_by_iri:
            raise MappingError(f"ttl: bridge {name}: unknown belongsToClassMap")
        refers = _local(props, "refersToClassMap")
        bnode_cols = _local(props, "bNodeIdColumns")
        pb = PropertyBridge(
            name=name,
            belongs_to_class_map=cm_by_iri[belongs],
            properties=_locals(props, "property"),
            dynamic_property=_local(props, "dynamicProperty"),
            column=_local(props, "column"),
            pattern=_local(props, "pattern"),
            sql_expression=_local(props, "sqlExpression"),
            uri_column=_local(props, "uriColumn"),
            uri_pattern=_local(props, "uriPattern"),
            uri_sql_expression=_local(props, "uriSqlExpression"),
            bnode_id_columns=[c.strip() for c in bnode_cols.split(",")] if bnode_cols else None,
            refers_to_class_map=cm_by_iri.get(refers) if refers else None,
            constant_value=_local(props, "constantValue"),
            datatype=_local(props, "datatype"),
            lang=_local(props, "lang"),
            translate_with=_resolve_tt(m, _local(props, "translateWith")),
            join=[Join.parse(j) for j in _locals(props, "join")],
            condition=_local(props, "condition"),
            alias=_locals(props, "alias"),
            limit=int(_local(props, "limit")) if _local(props, "limit") else None,
            limit_inverse=int(_local(props, "limitInverse")) if _local(props, "limitInverse") else None,
            order_column=_local(props, "orderAsc") or _local(props, "orderDesc"),
            order_desc=_local(props, "orderDesc") is not None,
            value_regex=_local(props, "valueRegex"),
            value_contains=_local(props, "valueContains"),
            value_max_length=int(_local(props, "valueMaxLength"))
            if _local(props, "valueMaxLength")
            else None,
        )
        m.add_bridge(pb)

    for s, props in typed("DownloadMap"):
        name = s.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
        content = _local(props, "contentDownloadColumn")
        m.download_maps[name] = DownloadMap(
            name=name,
            table=content.split(".")[0],
            uri_pattern=_local(props, "uriPattern"),
            content_column=content,
            media_type=_local(props, "mediaType"),
            condition=_local(props, "condition"),
        )

    m.validate()
    return m


def _resolve_tt(m: Mapping, ref: Optional[str]) -> Optional[str]:
    if ref is None:
        return None
    if ref in m.translation_tables:
        return m.translation_tables[ref].name
    return ref.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
