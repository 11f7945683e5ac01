"""generate-mapping — auto-write a mapping from table schemas.

Reference: mapgen/MappingGenerator.java (+ W3C Direct Mapping flavor,
mapgen/W3CMappingGenerator-style; SURVEY.md §2.1 S4/§7.3).  The reference
introspects JDBC catalog metadata (tables, columns, PKs, FKs); parquet
has no declared keys, so PK/FK metadata is passed in (or defaults to the
first column as PK — the convention of this repo's test fixtures, see
FIXTURES.md §1).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from ont_d2rq_spark.functions.pattern import encode_py
from ont_d2rq_spark.mapping.model import ClassMap, Database, Join, Mapping, PropertyBridge


def generate_mapping(
    spark: SparkSession,
    base_dir: str,
    tables: list[str],
    base_iri: str = "http://example.org/",
    primary_keys: Optional[dict[str, str]] = None,
    foreign_keys: Optional[dict[str, str]] = None,
    direct_mapping: bool = False,
) -> Mapping:
    """Build a Mapping with one ClassMap per table and one PropertyBridge
    per column; FK columns become refersToClassMap bridges.

    ``foreign_keys``: {"customer.c_nationkey": "nation.n_nationkey"}.
    ``direct_mapping``: use the W3C Direct Mapping URI shapes
    (<base>/<table>/<pk>=<v>, predicate <base><table>#<column>) instead of
    D2RQ's default vocab@@…@@ style.
    """
    primary_keys = dict(primary_keys or {})
    foreign_keys = dict(foreign_keys or {})
    db = Database(base_dir=base_dir)
    m = Mapping(database=db, base_iri=base_iri)

    schemas = {t: spark.read.parquet(db.path_for(t)).schema for t in tables}
    for t in tables:
        if t not in primary_keys:
            primary_keys[t] = schemas[t].fields[0].name

    def class_uri(t: str) -> str:
        return f"{base_iri}{encode_py(t, 'encode')}"

    def subject_pattern(t: str) -> str:
        pk = primary_keys[t]
        if direct_mapping:
            return f"{base_iri}{t}/{pk}=@@{t}.{pk}|encode@@"
        return f"{base_iri}{t}/@@{t}.{pk}|urlify@@"

    for t in tables:
        m.add_class_map(
            ClassMap(
                name=t,
                table=t,
                uri_pattern=subject_pattern(t),
                classes=[class_uri(t)],
                class_definition_label=t,
            )
        )
    for t in tables:
        fk_cols = {c.split(".", 1)[1]: tgt for c, tgt in foreign_keys.items() if c.split(".", 1)[0] == t}
        for fld in schemas[t].fields:
            col = fld.name
            if col in fk_cols:
                tgt_table = fk_cols[col].split(".", 1)[0]
                if tgt_table in tables:
                    m.add_bridge(
                        PropertyBridge(
                            name=f"{t}.{col}__ref",
                            belongs_to_class_map=t,
                            properties=[f"{base_iri}{t}#{col}" if direct_mapping else f"{base_iri}{t}_{col}"],
                            refers_to_class_map=tgt_table,
                            join=[Join(f"{t}.{col}", fk_cols[col], "=>")],
                        )
                    )
                    continue
            m.add_bridge(
                PropertyBridge(
                    name=f"{t}.{col}",
                    belongs_to_class_map=t,
                    properties=[f"{base_iri}{t}#{col}" if direct_mapping else f"{base_iri}{t}_{col}"],
                    column=f"{t}.{col}",
                )
            )
    m.validate()
    return m
