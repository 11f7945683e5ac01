"""Connected-components (large-star/small-star) correctness."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ont_d2rq_spark.operators.cc import (
    canonicalize_sameas,
    connected_components,
    rewrite_triples_canonical,
)


def cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    got = cc_dict(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_and_star(spark):
    # long chain exercises multiple iterations; star exercises hubs
    chain = [(i, i + 1) for i in range(0, 30)]
    star = [(100, 100 + i) for i in range(1, 50)]
    edges = spark.createDataFrame(chain + star, "src bigint, dst bigint")
    got = cc_dict(connected_components(edges))
    assert all(got[i] == 0 for i in range(31))
    assert all(got[100 + i] == 100 for i in range(50))


def test_direction_and_self_loops_ignored(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3), (3, 2)], "src bigint, dst bigint"
    )
    got = cc_dict(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1}


def test_string_nodes_and_alias_preference(spark):
    edges = spark.createDataFrame(
        [
            ("http://x/entity/A", "http://x/customer/5"),
            ("http://x/entity/B", "http://x/customer/5"),
            ("http://x/entity/C", "http://x/entity/D"),
        ],
        "src string, dst string",
    )
    m = {
        r["uri"]: r["canonical_uri"]
        for r in canonicalize_sameas(edges, alias_prefix="http://x/entity/").collect()
    }
    # all aliases of customer/5 collapse onto the REAL entity uri
    assert m["http://x/entity/A"] == "http://x/customer/5"
    assert m["http://x/entity/B"] == "http://x/customer/5"
    assert m["http://x/customer/5"] == "http://x/customer/5"
    # pure-alias component: representative is the min alias
    assert m["http://x/entity/D"] == "http://x/entity/C"


def test_rewrite_triples(spark):
    triples = spark.createDataFrame(
        pd.DataFrame(
            {
                "subj": ["a", "b"],
                "pred": ["p", "p"],
                "obj": ["b", "lit"],
                "obj_datatype": [None, None],
                "obj_lang": [None, None],
                "is_literal": [False, True],
            }
        )
    )
    mapping = spark.createDataFrame(
        [("a", "A"), ("b", "A")], "uri string, canonical_uri string"
    )
    got = {tuple(r) for r in rewrite_triples_canonical(triples, mapping).collect()}
    # subj a,b → A; uri object b → A; literal 'lit' untouched even though
    # a node named 'lit' could exist
    assert got == {
        ("A", "p", "A", None, None, False),
        ("A", "p", "lit", None, None, True),
    }


def test_small_star_orientation_and_equivalence(spark):
    """r7: _small_star output rows are already canonically oriented
    (u > v), so the former greatest/least re-canonicalization pass was
    an identity — assert both the invariant and set-equality with the
    old formulation on a random-ish graph."""
    import random

    from pyspark.sql import functions as F

    from ont_d2rq_spark.operators.cc import _canon_edges, _large_star, _small_star

    rnd = random.Random(7)
    rows = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(300)]
    e = _canon_edges(
        spark.createDataFrame(rows, "src bigint, dst bigint"), "src", "dst"
    )
    for step in (e, _large_star(e)):
        out = _small_star(step)
        assert out.filter(F.col("u") <= F.col("v")).count() == 0
        old = out.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        assert out.exceptAll(old).count() == 0 and old.exceptAll(out).count() == 0
