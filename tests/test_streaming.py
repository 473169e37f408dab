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


def test_stream_dedup_drops_planted_duplicates(spark, tmp_path):
    """Stateful dropDuplicates emits each content fingerprint exactly
    once: 6 docs with 2 planted exact-dup groups -> 4 rows, equal to
    the batch DISTINCT set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from georaster_spark.streaming.events import dedup_stream

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "delta"]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 6),
                "source": pa.array(["s"] * 6),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = sorted(r.fp for r in dedup_stream(spark, d).collect())
    import hashlib

    expect = sorted({hashlib.md5(t.encode()).hexdigest() for t in texts})
    assert got == expect  # 4 unique fingerprints, each emitted once


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


def test_stream_to_table_exactly_once(spark, tmp_path):
    """foreachBatch sink into the snapshot table layer: result equals
    the batch aggregate; a restart with the same checkpoint is a
    no-op; a replayed batch_id never double-commits."""
    from pyspark.sql import functions as F

    from georaster_spark.sources import icetable
    from georaster_spark.streaming.events import _batch_committer, stream_to_table

    sf = "/root/testdata/sf0.001"
    table = str(tmp_path / "win_table")
    ckpt = str(tmp_path / "ckpt")

    out = stream_to_table(spark, sf, table, ckpt)
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias("sum_value_e6"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))

    n_snaps = len(icetable.snapshots(table))
    # restart with the same checkpoint: source has no new data -> the
    # committed chain must not grow
    out2 = stream_to_table(spark, sf, table, ckpt)
    assert len(icetable.snapshots(table)) == n_snaps
    assert out2.count() == out.count()

    # sink-side idempotence: replaying an already-committed batch id
    # (crash between snapshot commit and checkpoint write) is a no-op
    committed = icetable.read_manifest(table)["extra"]["batch_id"]
    _batch_committer(table)(batch.limit(1), committed)
    assert len(icetable.snapshots(table)) == n_snaps


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Three microbatches (maxFilesPerTrigger=1): the watermark
    advances past window [00:00,01:00), the window is evicted and
    emitted, and a later batch's late row for it must be DROPPED
    (append-mode count stays 1) while on-time rows keep finalizing
    later windows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_file(name, rows, mtime):
        ts = pa.array([pa.scalar(t, type=pa.timestamp("us")) for t, _ in rows])
        uid = pa.array([u for _, u in rows], type=pa.int64())
        p = str(tmp_path / name)
        pq.write_table(pa.table({"ts": ts, "user_id": uid}), p)
        os.utime(p, (mtime, mtime))

    import datetime as dt

    base = dt.datetime(2025, 6, 1)
    h = dt.timedelta(hours=1)
    m10 = dt.timedelta(minutes=10)
    # batch 0 advances the watermark to 02:10; batch 1 evicts + emits
    # the hour-0/1 windows; batch 2 delivers the late 00:20 row AFTER
    # eviction — the only point where Spark GUARANTEES the drop
    # (late-but-not-yet-evicted rows may still aggregate)
    write_file("b1.parquet", [(base + m10, 1), (base + h + m10, 2), (base + 3 * h + m10, 3)], 1000)
    write_file("b2.parquet", [(base + 5 * h + m10, 4)], 2000)
    write_file("b3.parquet", [(base + 2 * m10, 9), (base + 6 * h + m10, 5)], 3000)

    from pyspark.sql import functions as F

    schema = "ts timestamp, user_id long"
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["w"]["start"].hour: r["n"] for r in spark.table("late_test").collect()
    }
    # hour 0: count stays 1 — the late 00:20 row arrived after its
    # window was evicted and was dropped; hours 1/3 finalized
    # normally; hours 5 and 6 never finalize (final watermark 05:10)
    assert got == {0: 1, 1: 1, 3: 1}
    assert sum(got.values()) == 3  # the late row is counted nowhere


def test_live_sessionizer_flushes_by_gap_and_watermark(spark, tmp_path):
    """sessionize_live emits a session when a later event closes it
    (gap) and when the watermark passes its deadline (event-time
    timeout) — without waiting for stream end. A session whose
    deadline the watermark never reaches stays open (unemitted)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georaster_spark.streaming.events import sessionize_live

    base = dt.datetime(2025, 6, 1)

    def write_file(name, rows, mtime):
        p = str(tmp_path / name)
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([t for t, *_ in rows], type=pa.timestamp("us")),
                    "event_id": pa.array([e for _, e, _, _ in rows], type=pa.int64()),
                    "user_id": pa.array([u for _, _, u, _ in rows], type=pa.int64()),
                    "event_type": pa.array([y for *_, y in rows]),
                }
            ),
            p,
        )
        os.utime(p, (mtime, mtime))

    mins = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    write_file("b1.parquet", [(mins(0), 1, 1, "view"), (mins(10), 2, 1, "click")], 1000)
    write_file("b2.parquet", [(mins(120), 3, 1, "purchase")], 2000)
    write_file("b3.parquet", [(mins(300), 4, 2, "view")], 3000)

    ev = (
        spark.readStream.schema("ts timestamp, event_id long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    sess = sessionize_live(ev, watermark="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("live_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = sorted(
        (r["user_id"], r["session_id"], r["session_start"], r["n_events"], r["event_types"])
        for r in spark.table("live_sess").collect()
    )
    # u1 session 1 closed by the gap to 02:00; u1 session 2 flushed by
    # the watermark (04:30 > 02:30 deadline); u2's session never
    # reaches its deadline -> still open, not emitted
    assert rows == [
        (1, 1, mins(0), 2, "click,view"),
        (1, 2, mins(120), 1, "purchase"),
    ]


def test_sessionize_live_kill_and_resume(spark, tmp_path):
    """Restart-consistency of the stateful sessionizer: drain part A
    with a checkpoint, 'kill' the query, add part B, restart from the
    SAME checkpoint — the union of emitted sessions must equal a
    one-shot run over A+B (state schema carries last_ts/session
    counter/open-session across restarts, streaming/events.py:14-16)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georaster_spark.streaming.events import sessionize_live

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    mins = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731

    def write_file(d, name, rows, mtime):
        p = str(d / name)
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([t for t, *_ in rows], type=pa.timestamp("us")),
                    "event_id": pa.array([e for _, e, _, _ in rows], type=pa.int64()),
                    "user_id": pa.array([u for _, _, u, _ in rows], type=pa.int64()),
                    "event_type": pa.array([y for *_, y in rows]),
                }
            ),
            p,
        )
        os.utime(p, (mtime, mtime))

    # part A: u1 has a session that CLOSES within A (gap), u2 has an
    # open session at the A/B boundary
    part_a = [
        (mins(0), 1, 1, "view"), (mins(5), 2, 1, "click"),
        (mins(90), 3, 1, "view"),           # u1 session 2 (gap > 30m)
        (mins(95), 4, 2, "view"),           # u2 session 1, still open
    ]
    # part B: u2 continues within the gap (same session), u1 far later
    part_b = [
        (mins(100), 5, 2, "click"),         # continues u2 session 1
        (mins(400), 6, 1, "purchase"),      # u1 session 3 + flushes 2
        (mins(400), 7, 2, "view"),          # u2 session 2 + flushes 1
    ]

    def run(indir, ckpt, outdir, phases):
        # parquet sink: supports checkpoint recovery (memory sink
        # does not) and its manifest gives exactly-once file commits
        out = []
        for files in phases:
            for name, rows, mtime in files:
                write_file(indir, name, rows, mtime)
            ev = (
                spark.readStream.schema(
                    "ts timestamp, event_id long, user_id long, event_type string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(str(indir))
            )
            q = (
                sessionize_live(ev, watermark="30 minutes")
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", str(outdir))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            rows = [
                tuple(r)
                for r in spark.read.parquet(str(outdir)).select(
                    "user_id", "session_id", "session_start", "n_events", "event_types"
                ).collect()
            ]
            assert len(rows) == len(set(rows)), "duplicate session emitted"
            out.append(set(rows))
        return out

    a_dir = tmp_path / "split"; a_dir.mkdir()
    phased = run(
        a_dir, tmp_path / "ck_split", tmp_path / "out_split",
        [
            [("a.parquet", part_a, 1000)],
            [("b.parquet", part_b, 2000)],
        ],
    )
    o_dir = tmp_path / "oneshot"; o_dir.mkdir()
    oneshot = run(
        o_dir, tmp_path / "ck_one", tmp_path / "out_one",
        [[("a.parquet", part_a, 1000), ("b.parquet", part_b, 2000)]],
    )
    # phase-1 output is a strict prefix of the resumed run...
    assert phased[0] <= phased[1]
    # ...and the resumed total equals the uninterrupted run
    assert phased[1] == oneshot[0]
    # the boundary-spanning u2 session stays ONE session with both events
    u2 = [r for r in phased[1] if r[0] == 2 and r[1] == 1]
    assert u2 and u2[0][3] == 2


def test_stream_stream_join_kill_and_resume(spark, tmp_path):
    """Restart-consistency of the stream-stream join's state store:
    drain part A with a checkpoint (views buffered, some unmatched),
    'kill' the query, add part B holding the matching clicks, restart
    from the SAME checkpoint — the union of emitted pairs must equal
    a one-shot run AND the batch self-join. Proves the buffered join
    state (a part-A view whose click only arrives in part B) survives
    the restart rather than being recomputed or lost."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georaster_spark.streaming.events import view_click_join

    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    mins = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731

    def write_file(d, name, rows, mtime):
        p = str(d / name)
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([t for t, *_ in rows], type=pa.timestamp("us")),
                    "event_id": pa.array([e for _, e, _, _ in rows], type=pa.int64()),
                    "user_id": pa.array([u for _, _, u, _ in rows], type=pa.int64()),
                    "event_type": pa.array([y for *_, y in rows]),
                }
            ),
            p,
        )
        os.utime(p, (mtime, mtime))

    # part A: u1 view+click both in A (matches within A); u2 view in A
    # whose click arrives only in B (the state-survival case); u3 view
    # whose click lands OUTSIDE the 1h horizon (must never match)
    part_a = [
        (mins(0), 1, 1, "view"), (mins(10), 2, 1, "click"),
        (mins(20), 3, 2, "view"),
        (mins(30), 4, 3, "view"),
    ]
    part_b = [
        (mins(50), 5, 2, "click"),    # matches u2's buffered A view
        (mins(200), 6, 3, "click"),   # > 1h after u3's view: no match
        (mins(60), 7, 1, "view"), (mins(70), 8, 1, "click"),  # B-only pair
    ]
    expect = {(1, 2, 1), (3, 5, 2), (7, 8, 1)}

    def run(indir, ckpt, outdir, phases):
        out = []
        for files in phases:
            for name, rows, mtime in files:
                write_file(indir, name, rows, mtime)
            ev = (
                spark.readStream.schema(
                    "ts timestamp, event_id long, user_id long, event_type string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(str(indir))
            )
            q = (
                view_click_join(ev, horizon="1 hour")
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", str(outdir))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            rows = [
                tuple(r)
                for r in spark.read.parquet(str(outdir))
                .select("view_id", "click_id", "user_id")
                .collect()
            ]
            assert len(rows) == len(set(rows)), "duplicate pair emitted"
            out.append(set(rows))
        return out

    a_dir = tmp_path / "split"; a_dir.mkdir()
    phased = run(
        a_dir, tmp_path / "ck_split", tmp_path / "out_split",
        [[("a.parquet", part_a, 1000)], [("b.parquet", part_b, 2000)]],
    )
    o_dir = tmp_path / "oneshot"; o_dir.mkdir()
    oneshot = run(
        o_dir, tmp_path / "ck_one", tmp_path / "out_one",
        [[("a.parquet", part_a, 1000), ("b.parquet", part_b, 2000)]],
    )
    assert phased[0] <= phased[1]
    assert phased[1] == oneshot[0] == expect
    # the cross-restart pair (view buffered in A, click in B) emitted
    assert (3, 5, 2) in phased[1] and (3, 5, 2) not in phased[0]


def test_stream_static_interval_join_equals_batch(spark):
    """Stream-static join: the availableNow replay of the streaming
    interval enrichment equals the batch bucketized interval join,
    row for row (the join is stateless; no watermark involved)."""
    from pyspark.sql import functions as F

    from georaster_spark.queries import (
        IVJ_LEN_S,
        _interval_windows,
        q_stream_interval,
    )
    from georaster_spark.operators.asof import bucketized_interval_join

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in q_stream_interval(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = (
        bucketized_interval_join(ev, _interval_windows(spark), bucket_seconds=IVJ_LEN_S)
        .groupBy("win_id", "s_ep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias(
                "sum_value_e6"
            ),
        )
    )
    expect = {tuple(r) for r in batch.collect()}
    assert got == expect and len(got) > 0


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream inner join: the availableNow replay
    emits exactly the batch self-join's (view, click) pairs within
    the 1-hour horizon."""
    from pyspark.sql import functions as F

    from georaster_spark.queries import q_stream_stream_join

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in q_stream_stream_join(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = v.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") < F.col("vts") + F.expr("INTERVAL 1 hour")),
    ).select("view_id", "click_id", "user_id")
    expect = {tuple(r) for r in batch.collect()}
    assert got == expect and len(got) > 0


def test_stream_warc_equals_batch_ingest(spark):
    """One availableNow replay of the static shard directory equals
    the batch WARC read row-for-row (url, ts, lang, text) — the
    batch/streaming no-drift gate for the crawl ingest path."""
    from georaster_spark.queries import q_stream_warc, q_warc_ingest

    sf = "/root/testdata/sf0.001"  # unused by both (fixture-driven)
    a = sorted(
        (r.url, r.ts_s, r.lang, r.http_status, r.n_bytes, r.text, r.text_h)
        for r in q_stream_warc(spark, sf).collect()
    )
    b = sorted(
        (r.url, r.ts_s, r.lang, r.http_status, r.n_bytes, r.text, r.text_h)
        for r in q_warc_ingest(spark, sf).collect()
    )
    assert len(a) == 600
    assert a == b
