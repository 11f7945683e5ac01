"""DownloadMap evaluation — serve one row's content column by URI.

Reference: download/DownloadContentQuery.java + map/DownloadMap
(SURVEY.md §2.1 S7): the download URI is inverted through the map's
uriPattern into key constraints; the single matching row's content
column is fetched.  The equality constraint is pushed into the scan, so
this is a point lookup, not a table scan.

For opaque media blobs referenced by `media_ref` columns (the
interleaved-document model), see operators/multimodal.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import functions as F

from ont_d2rq_spark.compiler.relation import _qualify, coerce_constant
from ont_d2rq_spark.functions.pattern import UriPattern


def download_content(graph, uri: str, name: Optional[str] = None) -> Tuple[object, Optional[str]]:
    """(content, media_type) for the first DownloadMap matching `uri`;
    (None, media_type) when the URI fits a map but no row matches;
    raises KeyError when no map's pattern fits."""
    maps = graph.mapping.download_maps
    candidates = [maps[name]] if name else list(maps.values())
    fit = False
    for dm in candidates:
        pattern = UriPattern.parse(dm.uri_pattern)
        inverted = pattern.invert(uri)
        if inverted is None:
            continue
        fit = True
        df = graph.compiler.table(dm.table).alias(dm.table)
        if dm.condition:
            df = df.filter(F.expr(dm.condition))
        ok = True
        for qcol, raw in inverted.items():
            q = _qualify(qcol, dm.table)
            try:
                const = coerce_constant(raw, graph.compiler.column_type(q, {}))
            except (ValueError, ArithmeticError):
                ok = False
                break
            df = df.filter(F.col(q) == F.lit(const))
        if not ok:
            continue
        row = df.select(F.col(_qualify(dm.content_column, dm.table))).limit(1).collect()
        if row:
            return row[0][0], dm.media_type
        return None, dm.media_type
    if fit:
        return None, None
    raise KeyError(f"no DownloadMap matches {uri!r}")
