"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dump — the full virtual-graph
materialization of the TPC-H-star mapping (every ClassMap +
PropertyBridge, fused one-scan-per-table, global distinct) at sf0.001.

``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions;
implementations live in ont_d2rq_spark/queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG materialization over /root/testdata/sf0.001."""
    from ont_d2rq_spark.examples import tpch_mapping
    from ont_d2rq_spark.graph import VirtualGraph
    from ont_d2rq_spark.session import ship_package

    ship_package(spark)
    g = VirtualGraph(tpch_mapping("/root/testdata/sf0.001"), spark)
    return g.triples(fuse=True, distinct=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ont_d2rq_spark.queries import QUERIES
    from ont_d2rq_spark.session import ship_package

    # ship the package to executor Python workers (the --py-files
    # equivalent) before any pandas-UDF query runs in a foreign session
    def wrap(fn):
        def run(spark, sf_dir):
            ship_package(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ont_d2rq_spark.queries import oracles

    return oracles()
