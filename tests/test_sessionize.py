"""Sessionization: batch gaps-and-islands ≡ streaming session_window,
plus the applyInPandasWithState custom stateful operator."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ont_d2rq_spark.streaming.sessionize import (
    running_totals_stream,
    sessionize,
    sessionize_stream,
)

T = dt.datetime


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap 45 min between event 3 and 4)
        (1, 1, T(2020, 1, 1, 10, 0), 1.0),
        (2, 1, T(2020, 1, 1, 10, 10), 2.0),
        (3, 1, T(2020, 1, 1, 10, 20), 3.0),
        (4, 1, T(2020, 1, 1, 11, 5), 4.0),
        # user 2: one session, equal timestamps (tie)
        (5, 2, T(2020, 1, 1, 9, 0), 5.0),
        (6, 2, T(2020, 1, 1, 9, 0), 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )


def test_sessionize_batch(events):
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in sessionize(events, gap_seconds=1800).collect()
    }
    assert got == {
        (1, 1): (3, 6.0),
        (1, 2): (1, 4.0),
        (2, 1): (2, 11.0),
    }


def test_sessionize_stream_matches_batch(spark, events):
    """session_window streaming sessions = batch gaps-and-islands
    sessions on the same data (availableNow drains the backlog)."""
    d = tempfile.mkdtemp()
    try:
        events.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{d}/in")
        q = (
            sessionize_stream(stream, gap="30 minutes", watermark="2 hours")
            .writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("select * from sess_out").collect()
        }
        batch = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in sessionize(events, gap_seconds=1800).collect()
        }
        assert got == batch
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_running_totals_state_across_microbatches(spark, events):
    """applyInPandasWithState keeps per-key state alive BETWEEN
    micro-batches: two input files, maxFilesPerTrigger=1 → two batches;
    the final total must equal the all-data count."""
    d = tempfile.mkdtemp()
    try:
        e1 = events.filter(F.col("event_id") <= 3)
        e2 = events.filter(F.col("event_id") > 3)
        e1.coalesce(1).write.mode("overwrite").parquet(f"{d}/in1")
        e2.coalesce(1).write.mode("overwrite").parquet(f"{d}/in2")
        import glob
        import os

        os.makedirs(f"{d}/in", exist_ok=True)
        for i, src in enumerate(
            glob.glob(f"{d}/in1/part-*.parquet") + glob.glob(f"{d}/in2/part-*.parquet")
        ):
            shutil.copy(src, f"{d}/in/file{i}.parquet")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("totals_out")
            .outputMode("update")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from totals_out").collect()
        # last emission per user = cumulative total across all batches
        final = {}
        for r in rows:
            final[r["user_id"]] = max(
                final.get(r["user_id"], 0), r["n_events_total"]
            )
        assert final == {1: 4, 2: 2}
        # state really spanned batches: user 1 appears in two emissions
        u1 = sorted(r["n_events_total"] for r in rows if r["user_id"] == 1)
        assert len(u1) >= 2 and u1[0] < u1[-1]
    finally:
        shutil.rmtree(d, ignore_errors=True)
