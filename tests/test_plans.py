"""Physical-plan assertions — the scale contract, not just results.

Checks that Catalyst produces the plans the design promises (SURVEY §4):
pushed-down scan filters from node binding, broadcast joins from FK
direction hints, one scan per table under bridge fusion, column-pruned
reads.
"""

import re

import pytest

from ont_d2rq_spark.examples import tpch_mapping
from ont_d2rq_spark.graph import VirtualGraph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph(spark):
    return VirtualGraph(tpch_mapping(SF), spark)


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bound_subject_pushes_scan_filter(graph):
    df = graph.find(s="http://example.org/customer/7", p="http://example.org/acctbal")
    p = plan(df)
    assert "PushedFilters" in p
    assert re.search(r"PushedFilters:.*EqualTo\(c_custkey,7\)", p)


def test_literal_bridge_prunes_columns(graph):
    cb = next(b for b in graph.bridges if b.name == "customer.acctbal")
    p = plan(graph.compiler.bridge_df(cb))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"c_custkey", "c_acctbal"}  # only what the node makers need


def test_fk_hint_broadcasts_dimension(graph):
    cb = next(b for b in graph.bridges if b.name == "customer.nation")
    p = plan(graph.compiler.bridge_df(cb))
    assert "BroadcastHashJoin" in p


def test_fused_dump_scans_each_fact_table_once(graph):
    """Join fusion: a base (fact) table is scanned ONCE for all its
    bridges — including its N:1 join bridges, whose dims attach as LEFT
    broadcast joins.  Dim tables may additionally appear once per
    referencing base group (they are broadcast; scan cost is trivial)."""
    p = plan(graph.compiler.fused_df(graph.bridges))
    for table in ["lineitem", "supplier"]:  # pure fact/base roles
        hits = len(re.findall(rf"{table}\.parquet", p))
        assert hits == 1, f"{table} scanned {hits}× in fused dump"
    # customer: own base group + dim of the orders group — never more
    assert len(re.findall(r"customer\.parquet", p)) <= 2
    assert len(re.findall(r"orders\.parquet", p)) <= 2
    # join fusion keeps the dim joins broadcast
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_unfused_dump_scans_more(graph):
    fused = plan(graph.compiler.fused_df(graph.bridges)).count("Scan parquet")
    unfused = 0
    for cb in graph.bridges:
        unfused += plan(graph.compiler.bridge_df(cb)).count("Scan parquet")
    assert fused < unfused  # fusion actually reduced scan count


def test_whole_stage_codegen_covers_mint(graph):
    cb = next(b for b in graph.bridges if b.name == "customer.name")
    p = plan(graph.compiler.bridge_df(cb))
    # '*'-prefixed operators = inside a WholeStageCodegen span; the mint
    # projection must be codegen'd (JVM-side, no Python)
    assert re.search(r"\* Project", p) and "codegen id" in p
