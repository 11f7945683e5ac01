"""SPARQL front-end — the analogue of QueryEngineD2RQ (SURVEY §3 E2).

The reference registers a custom ARQ engine: BGPs compile to SQL via
GraphPatternTranslator/NodeRelationJoiner, residual algebra runs in
ARQ.  Here the same split is: BGP + pushable FILTERs compile to the
DataFrame join DAG (graph.bgp), residual ops (ORDER BY, LIMIT,
DISTINCT, projection) are native DataFrame ops — Catalyst is both the
translator and the executor.

Grammar (the practical subset D2RQ deployments use):

  PREFIX pfx: <iri>                         (any number)
  SELECT [DISTINCT] (?v ... | *) WHERE {
      triple patterns '.'-separated;
      FILTER (<spark-sql boolean over vars, ?var references>)
      OPTIONAL { triple patterns }
  }
  [ORDER BY [ASC|DESC](?v) ...] [LIMIT n] [OFFSET n]
  ASK WHERE { ... }

Terms: <iri>, pfx:local, "literal" (@lang / ^^dt accepted, matched on
lexical form), numbers, ?var / $var, and 'a' for rdf:type.

Not supported (raise): UNION, GROUP BY/aggregates (use DataFrame ops on
the bgp() result), property paths, subqueries, CONSTRUCT/DESCRIBE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOK = re.compile(
    r"""
    (?P<iri><[^>\s]*>)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')(?P<lang>@[\w-]+)?(?:\^\^(?P<dtiri><[^>]*>|[\w.-]*:[\w.-]+))?
  | (?P<var>[?$][A-Za-z_]\w*)
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.%-]*)
  | (?P<kw>[A-Za-z_]+)
  | (?P<punct>[{}().;,*])
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


@dataclass
class Query:
    form: str  # SELECT | ASK
    variables: list[str] = field(default_factory=list)  # empty = *
    distinct: bool = False
    patterns: list[tuple] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    optional: list[list[tuple]] = field(default_factory=list)
    union: list[list[tuple]] = field(default_factory=list)  # alternative groups
    order_by: list[tuple] = field(default_factory=list)  # (var, desc)
    limit: Optional[int] = None
    offset: Optional[int] = None


class SparqlError(ValueError):
    pass


class _P:
    def __init__(self, text: str):
        self.toks = []
        pos = 0
        while pos < len(text):
            m = _TOK.match(text, pos)
            if not m:
                raise SparqlError(f"cannot tokenize at {text[pos:pos+30]!r}")
            pos = m.end()
            if m.lastgroup != "ws":
                self.toks.append(m)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return t

    def kw(self, *words) -> Optional[str]:
        t = self.peek()
        if t is not None and t.group(0).upper() in words:
            self.next()
            return t.group(0).upper()
        return None

    def expect(self, s):
        t = self.next()
        if t.group(0).upper() != s.upper():
            raise SparqlError(f"expected {s!r}, got {t.group(0)!r}")

    # ---- terms -----------------------------------------------------
    def term(self):
        t = self.next()
        g = t.group(0)
        if t.lastgroup in ("iri",):
            return g[1:-1]
        if t.group("str") is not None:
            # literal → matched on lexical form (graph nodes carry the
            # lexical value; datatype/lang live in separate columns)
            return t.group("str")[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if t.lastgroup == "var":
            return "?" + g[1:]
        if t.lastgroup == "num":
            return g
        if g == "a":
            return RDF_TYPE
        if t.group("local") is not None:
            pfx = t.group("pname") or ""
            if pfx not in self.prefixes:
                raise SparqlError(f"unknown prefix {pfx!r}")
            return self.prefixes[pfx] + t.group("local")
        raise SparqlError(f"unexpected token {g!r}")

    # ---- grammar ---------------------------------------------------
    def parse(self) -> Query:
        while self.kw("PREFIX"):
            t = self.next()
            if t.group("local") not in ("", None) or t.group("pname") is None and ":" not in t.group(0):
                # pname token with empty local, e.g. "ex:"
                pass
            pfx = t.group("pname") or ""
            iri = self.next().group(0)
            if not iri.startswith("<"):
                raise SparqlError("PREFIX needs <iri>")
            self.prefixes[pfx] = iri[1:-1]
        form = self.kw("SELECT", "ASK")
        if not form:
            raise SparqlError("only SELECT / ASK supported")
        q = Query(form=form)
        if form == "SELECT":
            q.distinct = bool(self.kw("DISTINCT"))
            while True:
                t = self.peek()
                if t is None:
                    raise SparqlError("missing WHERE")
                if t.group(0) == "*":
                    self.next()
                    break
                if t.lastgroup == "var":
                    q.variables.append(self.next().group(0)[1:])
                    continue
                break
        self.kw("WHERE")
        self.expect("{")
        self._group(q.patterns, q)
        # solution modifiers
        if self.kw("ORDER"):
            self.expect("BY")
            while True:
                t = self.peek()
                if t is None:
                    break
                if t.group(0).upper() in ("ASC", "DESC"):
                    d = self.next().group(0).upper() == "DESC"
                    self.expect("(")
                    v = self.term()
                    self.expect(")")
                    q.order_by.append((v[1:], d))
                elif t.lastgroup == "var":
                    q.order_by.append((self.next().group(0)[1:], False))
                else:
                    break
        if self.kw("LIMIT"):
            q.limit = int(self.next().group(0))
        if self.kw("OFFSET"):
            q.offset = int(self.next().group(0))
        return q

    def _group(self, patterns: list, q: Query):
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("unterminated group")
            g = t.group(0)
            if g == "}":
                self.next()
                return
            if g == ".":
                self.next()
                continue
            if g.upper() == "FILTER":
                self.next()
                q.filters.append(self._filter_expr())
                continue
            if g.upper() == "OPTIONAL":
                self.next()
                self.expect("{")
                sub: list = []
                self._group(sub, q)
                q.optional.append(sub)
                continue
            if g == "{":
                # group — only the { A } UNION { B } [UNION { C }] form
                self.next()
                first: list = []
                self._group(first, q)
                q.union.append(first)
                while self.kw("UNION"):
                    self.expect("{")
                    alt: list = []
                    self._group(alt, q)
                    q.union.append(alt)
                continue
            if g.upper() in ("GRAPH", "MINUS", "SERVICE", "BIND", "VALUES"):
                raise SparqlError(f"{g.upper()} not supported in this subset")
            s, p, o = self.term(), self.term(), self.term()
            patterns.append((s, p, o))
            # object lists: s p o1 , o2
            while self.peek() is not None and self.peek().group(0) == ",":
                self.next()
                patterns.append((s, p, self.term()))
            # predicate lists: s p1 o1 ; p2 o2
            while self.peek() is not None and self.peek().group(0) == ";":
                self.next()
                if self.peek() is not None and self.peek().group(0) in (".", "}"):
                    break
                p2, o2 = self.term(), self.term()
                patterns.append((s, p2, o2))

    def _filter_expr(self) -> str:
        """Capture the parenthesized FILTER body verbatim, translating
        ?var → var (a DataFrame column) — the expression language is
        Spark SQL, the engine the reference would translate INTO."""
        self.expect("(")
        depth = 1
        parts = []
        while depth > 0:
            t = self.next()
            g = t.group(0)
            if g == "(":
                depth += 1
            elif g == ")":
                depth -= 1
                if depth == 0:
                    break
            if t.lastgroup == "var":
                parts.append(g[1:])
            elif t.group("str") is not None:
                parts.append(g)
            else:
                parts.append(g)
        return " ".join(parts)


def parse(query: str) -> Query:
    return _P(query).parse()


def execute(graph, query: str) -> DataFrame:
    """Run a SPARQL query against a VirtualGraph → DataFrame of bindings
    (ASK → single boolean column 'ask')."""
    q = parse(query)
    if not q.union:
        df = graph.bgp(q.patterns, filters=q.filters, optional=q.optional)
    else:
        # { A } UNION { B }: each alternative binds its own variables;
        # columns missing from one side become NULL (unbound)
        from functools import reduce as _reduce

        parts = [graph.bgp(g) for g in q.union]
        df = _reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )
        if q.patterns:
            main = graph.bgp(q.patterns)
            shared = [c for c in main.columns if c in df.columns]
            df = main.join(df, on=shared, how="inner") if shared else main.crossJoin(df)
        for group in q.optional:
            sub = graph.bgp(group)
            shared = [c for c in df.columns if c in sub.columns]
            df = df.join(sub, on=shared, how="left") if shared else df.crossJoin(sub)
        for f in q.filters:
            df = df.filter(F.expr(f))
    if q.form == "ASK":
        return graph.spark.createDataFrame([(not df.isEmpty(),)], "ask boolean")
    if q.variables:
        df = df.select(*q.variables)
    if q.distinct:
        df = df.distinct()
    if q.order_by:
        df = df.orderBy(*[F.col(v).desc() if d else F.col(v).asc() for v, d in q.order_by])
    if q.offset:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df
