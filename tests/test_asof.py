"""As-of join operator (temporal point-in-time lookup)."""

import datetime as dt

from ont_d2rq_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 10, T(2020, 1, 5)),
            (2, 10, T(2020, 1, 1)),   # before any right row → NULL
            (3, 10, T(2020, 1, 10)),  # exactly equal ts → matches
            (4, 99, T(2020, 1, 5)),   # key with no right rows → NULL
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, T(2020, 1, 3), 100),
            (10, T(2020, 1, 10), 200),
        ],
        "user_id bigint, ts timestamp, val bigint",
    )
    out = {
        r["event_id"]: r["val_asof"]
        for r in asof_join(left, right, on="ts", by="user_id", right_cols=["val"]).collect()
    }
    assert out == {1: 100, 2: None, 3: 200, 4: None}


def test_asof_null_semantics(spark):
    """NULL payloads propagate (no leak of older non-null values); NULL
    keys/timestamps never match — mirrors SQL ASOF JOIN equality."""
    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 10, T(2020, 1, 6)),    # latest right row has NULL val → NULL
            (2, 10, T(2020, 1, 4)),    # older non-null still reachable → 100
            (3, None, T(2020, 1, 6)),  # NULL left key → unmatched
            (4, 10, None),             # NULL left ts → unmatched
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, T(2020, 1, 3), 100),
            (10, T(2020, 1, 5), None),   # NULL payload must come through as NULL
            (None, T(2020, 1, 1), 999),  # NULL right key must match nothing
            (10, None, 888),             # NULL right ts must match nothing
        ],
        "user_id bigint, ts timestamp, val bigint",
    )
    out = {
        r["event_id"]: r["val_asof"]
        for r in asof_join(left, right, on="ts", by="user_id", right_cols=["val"]).collect()
    }
    assert out == {1: None, 2: 100, 3: None, 4: None}


def test_asof_rejects_column_collision(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, 1)], "event_id bigint, user_id bigint, ts bigint")
    right = spark.createDataFrame([(1, 1, 1)], "user_id bigint, ts bigint, event_id bigint")
    with pytest.raises(ValueError):
        asof_join(left, right, on="ts", by="user_id", right_cols=["event_id"])
