"""Mapping → DataFrame compiler: the Spark analogue of D2RQ's algebra layer.

Reference layout (see SURVEY.md §0 provenance note):
  algebra/TripleRelation.java  — (SQL relation + S/P/O NodeMakers)
  algebra/Relation.java        — projections/joins/condition/order/limit
  nodes/TypedNodeMaker.java, values/{Column,Pattern,SQLExpression,
  BlankNodeID,Translator,ValueDecorator}.java — node/value makers
  algebra/{AliasMap,Join,JoinOptimizer}.java — aliases, joins, self-join elim

Differences by design (Spark-first, not a port):
  * A "relation" here is a lazily-built DataFrame DAG; Catalyst does
    projection pruning, predicate pushdown and join planning, so this
    compiler only decides WHAT to join/filter/mint, never how.
  * Node binding (find(s,p,o) with constants) happens at plan time in
    Python — pattern inversion yields typed equality constraints that
    reach the parquet scan as pushed filters.
  * Union batching (CompatibleRelationGroup) becomes bridge FUSION:
    bridges over the identical relation are evaluated in ONE scan via
    explode(array(struct(...))) — one pass over the table emits all its
    triples.  This is the main 100-TB throughput lever: a table with N
    bridges is read once, not N times.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from functools import reduce
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ont_d2rq_spark.functions.lexical import datatype_for, lexical_expr
from ont_d2rq_spark.functions.pattern import UriPattern
from ont_d2rq_spark.mapping.model import (
    ClassMap,
    Join,
    Mapping,
    MappingError,
    PropertyBridge,
    TranslationTable,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_datatype", T.StringType(), True),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("is_literal", T.BooleanType(), False),
    ]
)

_XSD_CAST = {
    "date": "date",
    "timestamp": "timestamp",
    "integer": "bigint",
    "long": "bigint",
    "decimal": "decimal(38,9)",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "binary": "binary",
}


class NotInvertible(Exception):
    """Node maker cannot be inverted to column constraints → fall back
    to a post-mint equality filter instead of pruning."""


@dataclass(frozen=True)
class NodeSpec:
    """NodeMaker analogue: how one of S/P/O is produced from a row."""

    kind: str  # uri_pattern|uri_column|uri_expr|bnode|literal_column|
    #            literal_pattern|literal_expr|constant
    pattern: Optional[UriPattern] = None
    column: Optional[str] = None
    expr: Optional[str] = None
    constant: Optional[str] = None
    is_literal: bool = False
    datatype: Optional[str] = None  # explicit d2rq:datatype override
    lang: Optional[str] = None
    translate: Optional[TranslationTable] = None
    bnode_name: Optional[str] = None
    bnode_columns: tuple = ()
    value_regex: Optional[str] = None
    value_contains: Optional[str] = None
    value_max_length: Optional[int] = None

    @property
    def columns(self) -> list[str]:
        if self.kind in ("uri_pattern", "literal_pattern"):
            return self.pattern.columns
        if self.kind in ("uri_column", "literal_column"):
            return [self.column]
        if self.kind == "bnode":
            return list(self.bnode_columns)
        return []


@dataclass
class CompiledBridge:
    """TripleRelation analogue: one relation + three node specs."""

    name: str
    class_map: ClassMap
    bridge: Optional[PropertyBridge]  # None for rdf:type relations
    subject: NodeSpec
    predicate: NodeSpec
    object: NodeSpec
    base_table: str
    base_alias: str
    aliases: dict[str, str] = field(default_factory=dict)  # alias -> table
    joins: tuple = ()
    conditions: tuple = ()
    order_column: Optional[str] = None
    order_desc: bool = False
    limit: Optional[int] = None
    distinct: bool = False

    def relation_key(self):
        """Bridges with the same key share one scan (fusion; the analogue
        of algebra/CompatibleRelationGroup.java union batching)."""
        return (
            self.base_table,
            self.base_alias,
            tuple(sorted(self.aliases.items())),
            tuple((j.left, j.right) for j in self.joins),
            self.conditions,
            self.order_column,
            self.order_desc,
            self.limit,
        )


def _qualify(col: str, default_alias: str) -> str:
    return col if "." in col else f"{default_alias}.{col}"


class MappingCompiler:
    """Compiles a Mapping into CompiledBridges and evaluates them.

    ``use_broadcast_hints``: a directed d2rq:join (``a => b``) marks b as
    the referenced (PK / dimension) side; when enabled the compiler wraps
    that side in ``F.broadcast`` — on a 1000-executor cluster this turns
    every FK-to-dimension join into a broadcast hash join with no shuffle
    of the fact side.  Undirected joins are left to Catalyst/AQE.
    """

    def __init__(
        self,
        mapping: Mapping,
        spark: SparkSession,
        extra_tables: Optional[dict[str, DataFrame]] = None,
        use_broadcast_hints: bool = True,
    ):
        self.mapping = mapping
        self.spark = spark
        self.extra_tables = extra_tables or {}
        self.use_broadcast_hints = use_broadcast_hints
        self._table_cache: dict[str, DataFrame] = {}
        # LRU-bounded: dataclasses.replace()'d bridge variants (e.g.
        # per-call limitInverse swaps) have fresh id(cb) keys that never
        # repeat, so an unbounded dict pins every such plan forever in a
        # long-lived session (ADVICE r6).  256 entries cover any real
        # mapping's repeated shapes; eviction just drops a memoized
        # plan, never correctness.
        from collections import OrderedDict

        self._bridge_df_cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._bridge_df_cache_cap = 256
        for sql in mapping.database.startup_sql:
            spark.sql(sql)

    # ---------------- table access ----------------------------------
    def prefetch_tables(self, names=None) -> None:
        """Open every mapped table concurrently (guide §2.6: overlap
        independent driver work).  Each first `spark.read...load()`
        runs a small schema/footer job plus driver-side planning; done
        serially that cascade fronts every dump with one gap+job per
        table.  DataFrameReader is thread-safe; results land in the
        table cache from the main thread via the futures."""
        from concurrent.futures import ThreadPoolExecutor

        if names is None:
            names = {cm.table for cm in self.mapping.class_maps.values()}
            for a in (
                al for cm in self.mapping.class_maps.values() for al in cm.alias
            ):
                names.add(a.split()[0])
        todo = [n for n in dict.fromkeys(names) if n not in self._table_cache]
        if len(todo) < 2:
            return
        with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
            futs = {n: pool.submit(self._open_table, n) for n in todo}
            for n, f in futs.items():
                self._table_cache.setdefault(n, f.result())

    def table(self, name: str) -> DataFrame:
        if name in self._table_cache:
            return self._table_cache[name]
        df = self._open_table(name)
        self._table_cache[name] = df
        return df

    def _open_table(self, name: str) -> DataFrame:
        if name in self.extra_tables:
            df = self.extra_tables[name]
        else:
            from ont_d2rq_spark.sources.tables import balanced_read

            db = self.mapping.database
            df = balanced_read(
                self.spark,
                db.path_for(name),
                fmt=db.table_formats.get(name),
                schema=db.table_schemas.get(name),
                options=db.table_options.get(name),
            )
        # d2rq column-type overrides (d2rq:dateColumn etc., SURVEY §1.2)
        for qcol, xsd in self.mapping.database.column_types.items():
            t, c = qcol.split(".", 1)
            if t == name and c in df.columns:
                if xsd == "char":
                    # SQL CHAR(n) right-pad semantics (SURVEY §1.2 row 1;
                    # reference: sql/types/SQLCharacterString trims via
                    # JDBC metadata — parquet has no CHAR, so it's a
                    # declared override here): strip trailing blanks at
                    # the scan, before any pattern/translation logic
                    df = df.withColumn(c, F.rtrim(F.col(c).cast("string")))
                else:
                    df = df.withColumn(c, F.col(c).cast(_XSD_CAST[xsd]))
        return df

    def column_type(self, qcol: str, aliases: dict[str, str]) -> T.DataType:
        alias, col = qcol.split(".", 1)
        table = aliases.get(alias, alias)
        return dict(
            (f.name, f.dataType) for f in self.table(table).schema.fields
        )[col]

    # ---------------- node specs ------------------------------------
    def _subject_spec(self, cm: ClassMap) -> NodeSpec:
        tt = (
            self.mapping.translation_tables.get(cm.translate_with)
            if cm.translate_with
            else None
        )
        if cm.uri_pattern:
            return NodeSpec("uri_pattern", pattern=UriPattern.parse(cm.uri_pattern))
        if cm.uri_column:
            return NodeSpec("uri_column", column=cm.uri_column, translate=tt)
        if cm.uri_sql_expression:
            return NodeSpec("uri_expr", expr=cm.uri_sql_expression)
        if cm.bnode_id_columns:
            return NodeSpec(
                "bnode", bnode_name=cm.name, bnode_columns=tuple(cm.bnode_id_columns)
            )
        return NodeSpec("constant", constant=cm.constant_value)

    def _object_spec(self, pb: PropertyBridge) -> NodeSpec:
        tt = (
            self.mapping.translation_tables.get(pb.translate_with)
            if pb.translate_with
            else None
        )
        deco = dict(
            value_regex=pb.value_regex,
            value_contains=pb.value_contains,
            value_max_length=pb.value_max_length,
        )
        if pb.refers_to_class_map:
            tgt = self.mapping.class_maps[pb.refers_to_class_map]
            return self._subject_spec(tgt)
        if pb.column:
            return NodeSpec(
                "literal_column",
                column=pb.column,
                is_literal=True,
                datatype=pb.datatype,
                lang=pb.lang,
                translate=tt,
                **deco,
            )
        if pb.pattern:
            return NodeSpec(
                "literal_pattern",
                pattern=UriPattern.parse(pb.pattern),
                is_literal=True,
                datatype=pb.datatype,
                lang=pb.lang,
                **deco,
            )
        if pb.sql_expression:
            return NodeSpec(
                "literal_expr",
                expr=pb.sql_expression,
                is_literal=True,
                datatype=pb.datatype,
                lang=pb.lang,
                **deco,
            )
        if pb.uri_column:
            return NodeSpec("uri_column", column=pb.uri_column, translate=tt, **deco)
        if pb.uri_pattern:
            return NodeSpec("uri_pattern", pattern=UriPattern.parse(pb.uri_pattern), **deco)
        if pb.uri_sql_expression:
            return NodeSpec("uri_expr", expr=pb.uri_sql_expression, **deco)
        if pb.bnode_id_columns:
            return NodeSpec(
                "bnode", bnode_name=pb.name, bnode_columns=tuple(pb.bnode_id_columns)
            )
        return NodeSpec(
            "constant", constant=pb.constant_value, is_literal=pb.constant_is_literal
        )

    # ---------------- compile --------------------------------------
    def compile(self) -> list[CompiledBridge]:
        """Every ClassMap type-triple + every PropertyBridge → one
        CompiledBridge (reference: MappingImpl.compile())."""
        self.mapping.validate()
        out: list[CompiledBridge] = []
        for cm in self.mapping.class_maps.values():
            subj = self._subject_spec(cm)
            base_alias, aliases = self._alias_env(cm, None)
            for cls in cm.classes:
                out.append(
                    CompiledBridge(
                        name=f"{cm.name}!type!{cls}",
                        class_map=cm,
                        bridge=None,
                        subject=subj,
                        predicate=NodeSpec("constant", constant=RDF_TYPE),
                        object=NodeSpec("constant", constant=cls),
                        base_table=cm.table,
                        base_alias=base_alias,
                        aliases=aliases,
                        joins=tuple(cm.join),
                        conditions=tuple(c for c in [cm.condition] if c),
                        distinct=cm.contains_duplicates,
                    )
                )
        for pb in self.mapping.bridges:
            cm = self.mapping.class_maps[pb.belongs_to_class_map]
            subj = self._subject_spec(cm)
            base_alias, aliases = self._alias_env(cm, pb)
            if pb.dynamic_property:
                pred = NodeSpec("uri_pattern", pattern=UriPattern.parse(pb.dynamic_property))
            else:
                pred = NodeSpec("constant", constant=pb.properties[0])
            obj = self._object_spec(pb)
            # refersToClassMap merges the TARGET map's relation too —
            # its condition, joins and aliases (reference: relation merge
            # in map/impl/PropertyBridgeImpl; SURVEY §2.3 J2).
            tgt_cond: list = []
            tgt_joins: tuple = ()
            if pb.refers_to_class_map:
                tgt = self.mapping.class_maps[pb.refers_to_class_map]
                if tgt.condition:
                    tgt_cond.append(tgt.condition)
                tgt_joins = tuple(tgt.join)
                for a in tgt.alias:
                    parts = a.split()
                    aliases[parts[2]] = parts[0]
            conds = tuple(c for c in [cm.condition, pb.condition, *tgt_cond] if c)
            joins = tuple(cm.join) + tuple(pb.join) + tgt_joins
            if self.mapping.configuration.use_all_optimizations:
                joins = self._eliminate_self_joins(joins, base_alias, aliases)
            for prop in pb.properties or [None]:
                p = pred if pb.dynamic_property else NodeSpec("constant", constant=prop)
                out.append(
                    CompiledBridge(
                        name=pb.name if prop in (None, (pb.properties or [None])[0]) else f"{pb.name}!{prop}",
                        class_map=cm,
                        bridge=pb,
                        subject=subj,
                        predicate=p,
                        object=obj,
                        base_table=cm.table,
                        base_alias=base_alias,
                        aliases=aliases,
                        joins=joins,
                        conditions=conds,
                        order_column=pb.order_column,
                        order_desc=pb.order_desc,
                        limit=pb.limit,
                        distinct=cm.contains_duplicates,
                    )
                )
                if pb.dynamic_property:
                    break
        return out

    def _alias_env(self, cm: ClassMap, pb: Optional[PropertyBridge]):
        """alias name -> real table, from 'table AS alias' declarations."""
        aliases: dict[str, str] = {}
        specs = list(cm.alias) + (list(pb.alias) if pb else [])
        for a in specs:
            parts = a.split()
            if len(parts) != 3 or parts[1].upper() != "AS":
                raise MappingError(f"bad alias {a!r}")
            aliases[parts[2]] = parts[0]
        base_alias = cm.table
        return base_alias, aliases

    def _eliminate_self_joins(self, joins: tuple, base_alias: str, aliases):
        """Self-join elimination (reference: algebra/JoinOptimizer.java):
        a join of a table to itself over the SAME column on both sides is
        an identity join — drop it.  (The full reference rule also uses
        unique-index metadata; parquet has none, so only the provably-
        identical case is removed.)"""
        kept = []
        for j in joins:
            lt, lc = j.left.split(".", 1)
            rt, rc = j.right.split(".", 1)
            real_l, real_r = aliases.get(lt, lt), aliases.get(rt, rt)
            if real_l == real_r and lc == rc and lt == rt:
                continue
            kept.append(j)
        return tuple(kept)

    # ---------------- relation building -----------------------------
    def _build_relation(self, cb: CompiledBridge) -> DataFrame:
        """Assemble the joined/filtered DataFrame for a bridge."""
        in_plan = {cb.base_alias}
        df = self.table(cb.base_table).alias(cb.base_alias)
        pending = list(cb.joins)
        guard = 0
        while pending:
            guard += 1
            if guard > 100:
                raise MappingError(f"bridge {cb.name}: join graph not connected")
            j = pending.pop(0)
            lt, rt = j.tables()
            if lt in in_plan and rt in in_plan:
                df = df.filter(F.col(j.left) == F.col(j.right))
                continue
            if lt not in in_plan and rt not in in_plan:
                pending.append(j)  # defer until one side is in the plan
                continue
            new_alias = rt if lt in in_plan else lt
            referenced_side = j.right.split(".")[0] if j.direction == "=>" else (
                j.left.split(".")[0] if j.direction == "<=" else None
            )
            other = self.table(cb.aliases.get(new_alias, new_alias)).alias(new_alias)
            if (
                self.use_broadcast_hints
                and referenced_side == new_alias
                and self._broadcastable(cb.aliases.get(new_alias, new_alias))
            ):
                other = F.broadcast(other)
            df = df.join(other, F.col(j.left) == F.col(j.right), "inner")
            in_plan.add(new_alias)
        for cond in cb.conditions:
            df = df.filter(F.expr(cond))
        return df

    # FK-broadcast size guard: the d2rq:join direction hint broadcasts
    # the REFERENCED side on the assumption it is a dimension, but a
    # fact-sized referenced table (measured: ×128-inflated customers,
    # ~1.9M keys) turns that into a multi-second SERIAL broadcast
    # build per join — the exact anti-pattern at 1000 executors.  The
    # hint only fires when the source's on-disk bytes are known and
    # under this cap; otherwise Catalyst/AQE picks the strategy from
    # its own stats (it still broadcasts genuinely small sides).
    FK_BROADCAST_CAP_BYTES = 32 << 20  # 32 MiB on disk

    def _broadcastable(self, table_name: str) -> bool:
        if table_name in self.extra_tables:
            return False  # injected frames carry no size info
        path = self.mapping.database.path_for(table_name)
        total = self._source_bytes(path)
        if total is None:
            import logging

            logging.getLogger(__name__).info(
                "FK-broadcast hint suppressed for %s: source size unknown "
                "(%s); Catalyst/AQE stats decide the join strategy",
                table_name,
                path,
            )
            return False
        return total <= self.FK_BROADCAST_CAP_BYTES

    def _source_bytes(self, path: str) -> Optional[int]:
        """On-disk bytes of a source path, or None when unknown.  Local
        paths use os.stat; URI paths (s3://, hdfs://, …) go through the
        JVM's Hadoop FileSystem.getContentSummary — driver-side metadata
        calls only, no data read either way."""
        import os
        import re as _re

        if _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) and not path.startswith(
            "file://"
        ):
            try:
                jvm = self.spark._jvm
                jpath = jvm.org.apache.hadoop.fs.Path(path)
                conf = self.spark._jsc.hadoopConfiguration()
                fs = jpath.getFileSystem(conf)
                return int(fs.getContentSummary(jpath).getLength())
            except Exception:
                return None
        local = path[len("file://"):] if path.startswith("file://") else path
        try:
            if os.path.isdir(local):
                return sum(
                    os.path.getsize(os.path.join(local, f))
                    for f in os.listdir(local)
                    if not f.startswith((".", "_"))
                )
            return os.path.getsize(local)
        except OSError:
            return None

    # Above this many entries a translation table joins as a broadcast
    # dict-DataFrame instead of a plan-embedded map literal (a 10M-entry
    # entity-linking dictionary would explode the plan / task binary).
    LARGE_TT_THRESHOLD = 10_000

    def _translate_expr(self, value: Column, tt: TranslationTable) -> Column:
        """Dictionary translation (values/Translator.java).  Small
        inline/CSV tables become a Catalyst map literal (JVM-side,
        broadcast with the plan); a py translator becomes a vectorized
        pandas UDF.  LARGE tables never reach here — bridge_df attaches
        them as broadcast joins (_attach_large_translations).
        Untranslatable value → NULL → triple dropped (d2rq semantics)."""
        if tt.to_rdf is not None:
            from pyspark.sql.functions import pandas_udf

            fn = tt.to_rdf
            udf = pandas_udf(fn, T.StringType())
            return udf(value.cast("string"))
        pairs = tt.load_pairs()
        lits = []
        for k, v in pairs.items():
            lits.extend([F.lit(k), F.lit(v)])
        return F.element_at(F.create_map(*lits), value.cast("string"))

    def _is_large_tt(self, spec: NodeSpec) -> bool:
        tt = spec.translate
        if tt is None or tt.to_rdf is not None:
            return False
        return len(tt.load_pairs()) >= self.LARGE_TT_THRESHOLD

    def _pre_translate_value(self, cb: CompiledBridge, spec: NodeSpec) -> Column:
        """The lexical value a column-backed spec feeds INTO its
        translation table (mirrors _node_exprs' pre-translate path)."""
        qcol = _qualify(spec.column, cb.base_alias)
        col = F.col(qcol)
        if spec.kind == "uri_column":
            return col.cast("string")
        val, _ = lexical_expr(col, self.column_type(qcol, cb.aliases))
        return val

    def _attach_large_translations(
        self, df: DataFrame, cb: CompiledBridge
    ) -> tuple[DataFrame, dict]:
        """Broadcast-join each LARGE translation table onto the relation
        (left join: untranslatable → NULL → triple dropped downstream,
        same semantics as the map-literal path).  → (df, {position:
        translated column name}) for triple_struct to consume.

        At 100 TB the dictionary is the small side: one broadcast, no
        shuffle of the fact scan, and the plan stays O(1) in dict size
        (the reference streams the same lookup through
        values/Translator.java row-by-row)."""
        overrides: dict[str, str] = {}
        for pos, spec in (
            ("subject", cb.subject),
            ("predicate", cb.predicate),
            ("object", cb.object),
        ):
            if not self._is_large_tt(spec) or spec.kind not in (
                "uri_column",
                "literal_column",
            ):
                continue
            out_col = f"__tt_{pos}"
            tdf = self.spark.createDataFrame(
                list(spec.translate.load_pairs().items()),
                f"__tt_key_{pos} string, {out_col} string",
            )
            key = self._pre_translate_value(cb, spec)
            df = df.join(
                F.broadcast(tdf), key == F.col(f"__tt_key_{pos}"), "left"
            ).drop(f"__tt_key_{pos}")
            overrides[pos] = out_col
        return df, overrides

    def _node_exprs(self, cb: CompiledBridge, spec: NodeSpec, tt_col: Optional[str] = None):
        """→ (value Column, datatype Column, lang Column, is_literal,
        required-not-null qualified columns).  ``tt_col``: pre-joined
        translated-value column (large translation tables) replacing the
        inline map-literal lookup."""
        resolve = lambda q: F.col(_qualify(q, cb.base_alias))
        required: list[str] = [_qualify(c, cb.base_alias) for c in spec.columns]

        if spec.kind == "constant":
            return (
                F.lit(spec.constant),
                F.lit(spec.datatype).cast("string"),
                F.lit(spec.lang).cast("string"),
                spec.is_literal,
                [],
            )
        if spec.kind in ("uri_pattern", "literal_pattern"):
            val = spec.pattern.mint_expr(resolve)
            return (
                val,
                F.lit(spec.datatype).cast("string"),
                F.lit(spec.lang).cast("string"),
                spec.kind == "literal_pattern",
                required,
            )
        if spec.kind in ("uri_column", "literal_column"):
            qcol = _qualify(spec.column, cb.base_alias)
            dt = self.column_type(qcol, cb.aliases)
            if spec.kind == "uri_column":
                val = resolve(spec.column).cast("string")
                datatype, lang, is_lit = None, None, False
            else:
                val, inferred = lexical_expr(resolve(spec.column), dt)
                lang = spec.lang
                datatype = spec.datatype or (None if lang else inferred)
                is_lit = True
            if spec.translate is not None:
                val = (
                    F.col(tt_col)
                    if tt_col is not None
                    else self._translate_expr(val, spec.translate)
                )
                required = [qcol]  # translation null handled by obj-not-null filter
            return (
                val,
                F.lit(datatype).cast("string"),
                F.lit(lang).cast("string"),
                is_lit,
                required,
            )
        if spec.kind in ("uri_expr", "literal_expr"):
            val = F.expr(spec.expr).cast("string")
            return (
                val,
                F.lit(spec.datatype).cast("string"),
                F.lit(spec.lang).cast("string"),
                spec.kind == "literal_expr",
                [],
            )
        if spec.kind == "bnode":
            cols = [resolve(c).cast("string") for c in spec.bnode_columns]
            val = F.concat(
                F.lit(f"_:{spec.bnode_name}@@"), F.concat_ws("@@", *cols)
            )
            return val, F.lit(None).cast("string"), F.lit(None).cast("string"), False, required
        raise MappingError(f"unknown node kind {spec.kind}")

    def triple_struct(
        self, cb: CompiledBridge, guard_conditions: bool = False, tt_overrides=None
    ) -> tuple[Column, Column]:
        """(struct(subj,pred,obj,…) or NULL, usable-for-fusion marker).
        NULL when any required column is NULL (P6) or object untranslatable.
        With ``guard_conditions`` the bridge's d2rq:condition filters are
        folded into the guard instead of the relation — used by join
        fusion, where bridges with different conditions share one scan."""
        tt_overrides = tt_overrides or {}
        s_val, _, _, _, s_req = self._node_exprs(cb, cb.subject, tt_overrides.get("subject"))
        p_val, _, _, _, p_req = self._node_exprs(cb, cb.predicate, tt_overrides.get("predicate"))
        o_val, o_dt, o_lang, o_lit, o_req = self._node_exprs(cb, cb.object, tt_overrides.get("object"))
        struct = F.struct(
            s_val.cast("string").alias("subj"),
            p_val.cast("string").alias("pred"),
            o_val.cast("string").alias("obj"),
            o_dt.alias("obj_datatype"),
            o_lang.alias("obj_lang"),
            F.lit(bool(o_lit)).alias("is_literal"),
        )
        notnull = (
            s_val.isNotNull() & p_val.isNotNull() & o_val.isNotNull()
        )
        for q in set(s_req + p_req + o_req):
            notnull = notnull & F.col(q).isNotNull()
        if guard_conditions is not False:  # may be an (empty) skip-set
            # a LEFT-joined dim row that is absent leaves the join columns
            # NULL ⇒ guard false ⇒ no triple: left join + guard ≡ the
            # bridge's original inner join + filter
            for j in cb.joins:
                notnull = notnull & F.col(j.left).isNotNull() & F.col(j.right).isNotNull()
            skip = guard_conditions if isinstance(guard_conditions, (set, frozenset)) else ()
            for cond in cb.conditions:
                if cond not in skip:
                    notnull = notnull & F.expr(cond)
        return F.when(notnull, struct), notnull

    # ---------------- evaluation ------------------------------------
    def bridge_df(
        self,
        cb: CompiledBridge,
        constraints: Optional[dict[str, object]] = None,
        post_filters: Optional[list] = None,
    ) -> DataFrame:
        """One bridge → triples DataFrame, with optional plan-time
        equality constraints (from node binding) pushed onto the scan.

        Memoized per compiler instance: a BGP with repeated shapes
        (e.g. two OPTIONALs both expanding `?x ex:name ?y` over every
        name bridge) rebuilds identical frames, and each rebuild costs
        dozens of py4j round-trips — the dominant driver-side constant
        in SPARQL plan construction.  DataFrames are immutable, so
        returning the same logical frame to every caller is safe; the
        key covers everything the result depends on (bridge identity,
        pushed constraints, post-filter expressions).  Identity is
        id(cb), NOT cb.name — dataclasses.replace() derives same-name
        variants (limitInverse swaps); the cache value pins the bridge
        object so a collected variant's id cannot be reused."""
        key = (
            id(cb),
            tuple(sorted((k, str(v)) for k, v in (constraints or {}).items())),
            tuple(str(f) for f in (post_filters or [])),
        )
        cached = self._bridge_df_cache.get(key)
        if cached is not None:
            self._bridge_df_cache.move_to_end(key)
            return cached[1]
        df = self._build_relation(cb)
        for qcol, const in (constraints or {}).items():
            df = df.filter(F.col(qcol) == F.lit(const))
        df, tt_cols = self._attach_large_translations(df, cb)
        struct, notnull = self.triple_struct(cb, tt_overrides=tt_cols)
        df = df.filter(notnull)
        if cb.order_column:
            oc = F.col(_qualify(cb.order_column, cb.base_alias))
            df = df.orderBy(oc.desc() if cb.order_desc else oc.asc())
        out = df.select(struct.alias("t")).select("t.*")
        for flt in post_filters or []:
            out = out.filter(flt)
        if cb.limit is not None:
            out = out.limit(cb.limit)
        if cb.distinct:
            out = out.dropDuplicates(["subj", "pred", "obj", "obj_datatype", "obj_lang"])
        cap = self.mapping.database.result_size_limit
        if cap is not None:
            out = out.limit(cap)
        self._bridge_df_cache[key] = (cb, out)
        while len(self._bridge_df_cache) > self._bridge_df_cache_cap:
            self._bridge_df_cache.popitem(last=False)
        return out

    def _n_to_1_joins(self, cb: CompiledBridge) -> bool:
        """True when every join of the bridge attaches a REFERENCED (PK,
        '=>'/'<=' hint) table to the base — i.e. N:1 fact→dim hops that
        cannot multiply base rows.  Only such bridges may join-fuse."""
        if not cb.joins:
            return True
        for j in cb.joins:
            lt, rt = j.tables()
            if j.direction == "=>" and lt == cb.base_alias:
                continue
            if j.direction == "<=" and rt == cb.base_alias:
                continue
            return False
        return True

    def fused_df(self, bridges: list[CompiledBridge]) -> DataFrame:
        """Fusion: all bridges sharing a base table → ONE scan of it.

        Two levels (the Spark re-expression of union batching,
        algebra/CompatibleRelationGroup.java — SURVEY §4):
          * projection fusion: bridges over the identical relation emit
            their triples via explode(array(struct,…)) + null filter;
          * join fusion: single-hop N:1 (FK-hinted) join bridges are
            folded into the base group — their dims attach as LEFT
            broadcast joins and their conditions/join-null checks move
            into per-bridge struct guards.  A 100 TB fact table is then
            scanned ONCE for all its bridges instead of once per join
            bridge; dims are broadcast, the fact side never shuffles.
        Bridges with order/limit/distinct, multi-hop or un-hinted joins
        evaluate standalone (rare; never the hot fact path)."""
        self.prefetch_tables(
            {cb.base_table for cb in bridges}
            | {cb.aliases.get(t, t) for cb in bridges for j in cb.joins for t in j.tables()}
        )
        by_key: dict = {}
        singles: list[CompiledBridge] = []
        for cb in bridges:
            has_large_tt = any(
                self._is_large_tt(s) for s in (cb.subject, cb.predicate, cb.object)
            )
            if (
                cb.limit is not None
                or cb.order_column
                or cb.distinct
                or has_large_tt  # broadcast-dict join path → singles
                or not self._n_to_1_joins(cb)
            ):
                singles.append(cb)
                continue
            key = (cb.base_table, cb.base_alias, tuple(sorted(cb.aliases.items())))
            by_key.setdefault(key, []).append(cb)

        frames = []
        for (base_table, base_alias, aliases), group in by_key.items():
            # alias-conflict check: one join spec per joined table alias
            join_env: dict[str, tuple] = {}
            fused: list[CompiledBridge] = []
            for cb in group:
                specs = {}
                ok = True
                for j in cb.joins:
                    lt, rt = j.tables()
                    tgt = rt if lt == base_alias else lt
                    spec = (j.left, j.right)
                    if join_env.get(tgt, spec) != spec or specs.get(tgt, spec) != spec:
                        ok = False
                        break
                    specs[tgt] = spec
                if ok:
                    join_env.update(specs)
                    fused.append(cb)
                else:
                    singles.append(cb)
            if not fused:
                continue
            if len(fused) == 1 and not fused[0].joins:
                frames.append(self.bridge_df(fused[0]))
                continue
            alias_map = dict(aliases)
            df = self.table(base_table).alias(base_alias)
            for tgt, (left, right) in join_env.items():
                other = self.table(alias_map.get(tgt, tgt)).alias(tgt)
                if self.use_broadcast_hints and self._broadcastable(
                    alias_map.get(tgt, tgt)
                ):
                    other = F.broadcast(other)
                df = df.join(other, F.col(left) == F.col(right), "left")
            # conditions every fused bridge shares (e.g. the ClassMap-level
            # d2rq:condition) stay on the relation → pushed to the scan;
            # only per-bridge extras become struct guards
            common = frozenset.intersection(
                *[frozenset(cb.conditions) for cb in fused]
            )
            for cond in common:
                df = df.filter(F.expr(cond))
            structs = [self.triple_struct(cb, guard_conditions=common)[0] for cb in fused]
            # explode the raw array and drop NULL structs in a separate
            # Filter: array_compact is a higher-order function
            # (ArrayFilter = CodegenFallback) and at the top of the
            # stage it silently disabled WHOLE-STAGE CODEGEN for the
            # entire dump pipeline — measured on the finalized plan
            # (zero *(n) spans).  explode + isNotNull is codegen'd.
            fused_frame = (
                df.select(F.explode(F.array(*structs)).alias("t"))
                .filter(F.col("t").isNotNull())
                .select("t.*")
            )
            # d2rq:resultSizeLimit applies per relation in BOTH
            # evaluation modes (bridge_df caps singles; fuse must not
            # silently lift the cap the mapping declares)
            cap = self.mapping.database.result_size_limit
            if cap is not None:
                fused_frame = fused_frame.limit(cap)
            frames.append(fused_frame)

        for cb in singles:
            frames.append(self.bridge_df(cb))
        if not frames:
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        return reduce(lambda a, b: a.unionByName(b), frames)


def coerce_constant(value: str, dt: T.DataType):
    """Typed constant for a pushed-down equality filter; raises
    ValueError on type mismatch (⇒ the relation is pruned — the
    reference's datatype-mismatch relation rejection)."""
    if isinstance(dt, T.StringType):
        return str(value)
    s = str(value)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(s)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(s)
    if isinstance(dt, T.BooleanType):
        if s.lower() in ("true", "1"):
            return True
        if s.lower() in ("false", "0"):
            return False
        raise ValueError(s)
    if isinstance(dt, T.DateType):
        return _dt.date.fromisoformat(s)
    if isinstance(dt, T.TimestampType):
        return _dt.datetime.fromisoformat(s.replace("T", " ").rstrip("Z"))
    return s
