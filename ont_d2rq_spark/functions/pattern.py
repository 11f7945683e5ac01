"""Invertible URI / literal patterns and percent-encoders.

Re-expresses the semantics of D2RQ's pattern value maker
(reference layout: src/main/java/de/fuberlin/wiwiss/d2rq/values/Pattern.java
and mapgen/IRIEncoder.java — see SURVEY.md §0: the reference checkout was
empty this session, so the semantics below follow the published D2RQ
mapping-language spec and are pinned by this repo's own round-trip tests).

A pattern is a string with ``@@table.column@@`` placeholders, optionally
``@@table.column|encoder@@`` where encoder ∈ {urlify, urlencode, encode}:

  mint    : literal parts concatenated with (encoded) column values.
            Any NULL column ⇒ the whole value is NULL ⇒ no triple (P6).
  invert  : a concrete value is parsed back into per-column constants
            via an anchored regex over the literal skeleton; mismatch ⇒
            the owning relation is pruned (P3).  Inversion happens at
            PLAN time in Python (it binds constants), never per row.

Minting runs entirely JVM-side as Catalyst expressions (``concat`` +
``url_encode``); there is no Python in the row path.

Encoder semantics (mirrors java.net.URLEncoder, which backs Spark's
``url_encode`` and D2RQ's urlencode):
  urlencode : UTF-8 percent-encoding, space→'+', unreserved = [A-Za-z0-9.*_-]
  urlify    : like urlencode but space→'_' first (D2RQ wiki-style URIs);
              inverse maps '_' back to space.
  encode    : RFC-3986-style, space→'%20' (urlencode with '+'→'%20').
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters java.net.URLEncoder leaves untouched.
_JAVA_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789.-*_"
)

ENCODERS = ("urlify", "urlencode", "encode")


def encode_py(value: str, encoder: Optional[str]) -> str:
    """Python twin of :func:`encode_expr` (used only at plan time)."""
    if encoder is None:
        return value
    if encoder == "urlify":
        value = value.replace(" ", "_")
    out = []
    for ch in value:
        if ch in _JAVA_UNRESERVED:
            out.append(ch)
        elif ch == " ":
            out.append("+")
        else:
            out.append("".join("%%%02X" % b for b in ch.encode("utf-8")))
    s = "".join(out)
    if encoder == "encode":
        s = s.replace("+", "%20")
    return s


def decode_py(value: str, encoder: Optional[str]) -> str:
    """Inverse of :func:`encode_py` for pattern inversion at plan time."""
    if encoder is None:
        return value
    s = value.replace("+", " ") if encoder in ("urlify", "urlencode") else value
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i] == "%" and i + 2 < len(s) + 1 and re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            out.extend(bytes([int(s[i + 1 : i + 3], 16)]))
            i += 3
        else:
            out.extend(s[i].encode("utf-8"))
            i += 1
    decoded = out.decode("utf-8", errors="replace")
    if encoder == "urlify":
        decoded = decoded.replace("_", " ")
    return decoded


def encode_expr(col: Column, encoder: Optional[str]) -> Column:
    """Catalyst expression applying `encoder` to a string column (JVM-side)."""
    if encoder is None:
        return col
    if encoder == "urlify":
        return F.url_encode(F.replace(col, F.lit(" "), F.lit("_")))
    if encoder == "urlencode":
        return F.url_encode(col)
    if encoder == "encode":
        return F.replace(F.url_encode(col), F.lit("+"), F.lit("%20"))
    raise ValueError(f"unknown encoder {encoder!r}")


@dataclass(frozen=True)
class ColumnRef:
    """A ``@@qualified.column|encoder@@`` placeholder."""

    column: str  # qualified name as written in the mapping, e.g. "customer.c_custkey"
    encoder: Optional[str] = None


_PLACEHOLDER = re.compile(r"@@([^@|]+?)(?:\|(urlify|urlencode|encode))?@@")


@dataclass(frozen=True)
class UriPattern:
    """Parsed pattern: ``parts`` alternates literal str / ColumnRef."""

    source: str
    parts: tuple

    @classmethod
    def parse(cls, pattern: str) -> "UriPattern":
        parts: list = []
        pos = 0
        for m in _PLACEHOLDER.finditer(pattern):
            if m.start() > pos:
                parts.append(pattern[pos : m.start()])
            parts.append(ColumnRef(m.group(1).strip(), m.group(2)))
            pos = m.end()
        if pos < len(pattern):
            parts.append(pattern[pos:])
        if not parts:
            parts = [""]
        return cls(source=pattern, parts=tuple(parts))

    # ---- introspection -------------------------------------------------
    @property
    def columns(self) -> list[str]:
        return [p.column for p in self.parts if isinstance(p, ColumnRef)]

    @property
    def is_constant(self) -> bool:
        return not self.columns

    # ---- mint (JVM-side) -----------------------------------------------
    def mint_expr(self, resolve: Callable[[str], Column]) -> Column:
        """Catalyst concat; NULL column ⇒ NULL result (SQL concat semantics),
        which downstream drops — the D2RQ NULL rule (SURVEY §2.2 P6)."""
        cols = []
        for p in self.parts:
            if isinstance(p, ColumnRef):
                cols.append(encode_expr(resolve(p.column).cast("string"), p.encoder))
            else:
                cols.append(F.lit(p))
        if len(cols) == 1:
            return cols[0]
        return F.concat(*cols)

    # ---- mint (plan-time Python twin, for tests/constants) --------------
    def mint_py(self, values: dict) -> Optional[str]:
        out = []
        for p in self.parts:
            if isinstance(p, ColumnRef):
                v = values.get(p.column)
                if v is None:
                    return None
                out.append(encode_py(str(v), p.encoder))
            else:
                out.append(p)
        return "".join(out)

    # ---- invert (plan-time) ---------------------------------------------
    def _regex(self) -> re.Pattern:
        rx = ["^"]
        n_refs = sum(1 for p in self.parts if isinstance(p, ColumnRef))
        seen = 0
        for p in self.parts:
            if isinstance(p, ColumnRef):
                seen += 1
                # last capture is greedy-to-end; inner captures lazy — same
                # first-match discipline as the reference pattern matcher.
                rx.append("(.*)" if seen == n_refs else "(.*?)")
            else:
                rx.append(re.escape(p))
        rx.append("$")
        return re.compile("".join(rx), re.DOTALL)

    def invert(self, value: str) -> Optional[dict]:
        """Concrete node value → {qualified column: decoded constant},
        or None when the value cannot have been minted by this pattern.
        This is relation pruning / constraint binding (SURVEY §2.2 P3)."""
        m = self._regex().match(value)
        if not m:
            return None
        refs = [p for p in self.parts if isinstance(p, ColumnRef)]
        out = {}
        for ref, grp in zip(refs, m.groups()):
            decoded = decode_py(grp, ref.encoder)
            if ref.column in out and out[ref.column] != decoded:
                return None  # same column twice with conflicting values
            out[ref.column] = decoded
        return out

    def could_fit(self, value: str) -> bool:
        return self._regex().match(value) is not None
