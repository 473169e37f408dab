"""Structured Streaming surface: availableNow replay of a static
input must equal the batch computation (the streaming correctness
gate per SURVEY.md — engine-added capability, reference is
batch-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from georaster_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_stream_window_agg_equals_batch(spark):
    stream = Q.q_stream_window_agg(spark, SF).orderBy("hour", "event_type").collect()
    batch = (
        Q.q_events_window_agg(spark, SF)
        .withColumn("hour", F.col("hour").cast("timestamp"))
        .orderBy("hour", "event_type")
        .collect()
    )
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]
    assert len(stream) > 0


def test_stream_sessionize_equals_batch_rollup(spark):
    sess = Q.q_stream_sessionize(spark, SF)
    rollup = (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
        .collect()
    )
    batch = Q.q_sessionize(spark, SF).orderBy("user_id").collect()
    assert [tuple(r) for r in rollup] == [tuple(r) for r in batch]
    assert len(rollup) > 0


def test_stream_sessionize_session_invariants(spark):
    rows = Q.q_stream_sessionize(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r["session_id"])
        # session ids are 1..n dense, starts strictly increasing
        assert [s["session_id"] for s in sess] == list(range(1, len(sess) + 1))
        starts = [s["session_start"] for s in sess]
        assert starts == sorted(starts)
        assert all(s["n_events"] >= 1 for s in sess)
