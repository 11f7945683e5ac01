"""Round-trip tests for invertible URI patterns + encoders
(the hard part #1 in SURVEY.md §7)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ont_d2rq_spark.functions.pattern import UriPattern, decode_py, encode_py


def test_parse_parts():
    p = UriPattern.parse("http://ex/p@@t.a@@/x@@t.b|urlencode@@")
    assert p.columns == ["t.a", "t.b"]
    assert p.parts[0] == "http://ex/p"


def test_mint_and_invert_simple():
    p = UriPattern.parse("http://ex/customer/@@c.k@@")
    assert p.mint_py({"c.k": 42}) == "http://ex/customer/42"
    assert p.invert("http://ex/customer/42") == {"c.k": "42"}
    assert p.invert("http://ex/supplier/42") is None


def test_mint_null_column_gives_none():
    p = UriPattern.parse("http://ex/@@c.k@@")
    assert p.mint_py({"c.k": None}) is None


def test_two_columns_invert():
    p = UriPattern.parse("http://ex/@@t.a@@/@@t.b@@")
    assert p.invert("http://ex/1/2") == {"t.a": "1", "t.b": "2"}


def test_repeated_column_conflict():
    p = UriPattern.parse("http://ex/@@t.a@@/@@t.a@@")
    assert p.invert("http://ex/1/1") == {"t.a": "1"}
    assert p.invert("http://ex/1/2") is None


def test_urlify_space_underscore():
    p = UriPattern.parse("http://ex/@@t.name|urlify@@")
    assert p.mint_py({"t.name": "Full Professor"}) == "http://ex/Full_Professor"
    assert p.invert("http://ex/Full_Professor") == {"t.name": "Full Professor"}


def test_urlencode_reserved():
    assert encode_py("a b#c", "urlencode") == "a+b%23c"
    assert encode_py("a b#c", "encode") == "a%20b%23c"
    assert decode_py("a+b%23c", "urlencode") == "a b#c"


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_encode_roundtrip_urlencode(s):
    assert decode_py(encode_py(s, "urlencode"), "urlencode") == s


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_characters="_", blacklist_categories=("Cs",)),
        max_size=30,
    )
)
def test_encode_roundtrip_urlify(s):
    # urlify maps space<->underscore, so values containing literal '_'
    # are excluded (documented D2RQ caveat)
    assert decode_py(encode_py(s, "urlify"), "urlify") == s


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**12), st.integers(min_value=0, max_value=10**12))
def test_pattern_roundtrip_numeric(a, b):
    p = UriPattern.parse("urn:x:@@t.a@@:@@t.b@@")
    minted = p.mint_py({"t.a": a, "t.b": b})
    assert p.invert(minted) == {"t.a": str(a), "t.b": str(b)}


def test_mint_expr_jvm_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Full Professor", 7), ("a b#c", 9)], "name string, k int"
    )
    p = UriPattern.parse("http://ex/@@t.name|urlify@@/@@t.k@@")
    got = [
        r[0]
        for r in df.select(p.mint_expr(lambda q: F.col(q.split(".")[1]))).collect()
    ]
    exp = [
        p.mint_py({"t.name": "Full Professor", "t.k": 7}),
        p.mint_py({"t.name": "a b#c", "t.k": 9}),
    ]
    assert got == exp
