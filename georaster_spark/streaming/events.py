"""Structured Streaming surface over the events table.

The reference is a batch-only library (SURVEY.md §2.3: no streaming
surface), so this module is engine-added capability for the webtext
pipeline: the same windowed aggregation and gap-sessionization the
batch catalog exposes (queries.q_events_window_agg / q_sessionize),
re-expressed as streams with correct late-data semantics.

Design:
- source: file stream over the events parquet (schema pinned from a
  batch read — a streaming source must not infer);
- ``withWatermark`` bounds state: at 100 TB/day the window state
  would otherwise grow without bound;
- sessionization uses ``applyInPandasWithState`` (GroupState with
  processing-time timeout) — the custom-stateful-operator escape
  hatch for semantics Spark's built-in session_window can't express
  (we need per-session event counts AND a deterministic session id);
- every helper runs with ``trigger(availableNow=True)`` into a
  memory sink and returns the result as a plain DataFrame, so the
  batch harness (queries()/oracle_sql()) can gate it: the streaming
  result must equal the batch query bit-for-bit on a static input.
"""

from __future__ import annotations

import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 1800


def stream_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-stream over a static testdata parquet table (availableNow
    replays it once — the unit-test harness for streaming plans).

    FileStreamSource requires a *directory*; the testdata table is a
    single file, so it is exposed through a symlink dir under /tmp
    (read-only on the data itself)."""
    import hashlib
    import os
    import tempfile

    src = f"{sf_dir}/{table}.parquet"
    if os.path.isfile(src):
        # deterministic per source path: a restart from a checkpoint
        # must resolve the SAME directory or FileStreamSource's
        # recorded offsets point at a dead basePath
        tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
        d = os.path.join(tempfile.gettempdir(), f"stream_{table}_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, f"{table}.parquet")
        # lexists: a dangling symlink must be repaired, not re-created
        # (os.path.exists follows the link and would report False)
        if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(src):
            os.unlink(link)
        if not os.path.lexists(link):
            os.symlink(src, link)
        src = d
    schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
    return spark.readStream.schema(schema).parquet(src)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    # event-time ops (watermark) need TIMESTAMP, parquet infers NTZ;
    # session tz is pinned UTC so the cast is value-preserving
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over the documents stream: emit each
    content fingerprint the FIRST time it is seen (``dropDuplicates``
    keeps a seen-set in the state store). On a static availableNow
    replay the emitted set equals batch ``SELECT DISTINCT md5(text)``
    — the oracle's equivalence.

    Scale notes: state is deliberately UNBOUNDED — whole-corpus exact
    dedup must remember every fingerprint (RocksDB state store +
    state-key = 16-byte hash keeps it compact: ~100 GB of state per
    trillion docs, partitioned across executors). When the stream has
    an event-time column, ``dropDuplicatesWithinWatermark`` is the
    bounded-state variant (dedup horizon = watermark delay)."""
    docs = stream_table(spark, sf_dir, "documents")
    uniq = docs.select(F.md5("text").alias("fp")).dropDuplicates(["fp"])
    return _run_to_memory(uniq, "stream_dedup", "append")


def interval_counts_stream(
    spark: SparkSession, sf_dir: str, wins: DataFrame, bucket_seconds: int
) -> DataFrame:
    """STREAM-STATIC join: the streaming events feed equi-joins a
    static interval table through the same bucketize-explode rewrite
    as the batch operator (operators/asof.py bucketized_interval_join
    — the static side broadcasts, the join itself is STATELESS: no
    state store, no watermark needed for the join), then a
    complete-mode aggregate per window. On an availableNow replay the
    result must equal the batch interval join — the oracle's
    equivalence. At scale this is the enrichment pattern: an
    unbounded stream decorated by a slowly-changing dimension without
    any stream-stream state."""
    from georaster_spark.operators.asof import bucketized_interval_join

    ev = stream_events(spark, sf_dir)
    joined = bucketized_interval_join(
        ev, wins, bucket_seconds=bucket_seconds, broadcast_intervals=True
    )
    # no countDistinct here: distinct aggregates are unsupported on
    # streams (state would be unbounded per group) — the batch twin
    # keeps it; approx_count_distinct is the streaming alternative
    agg = joined.groupBy("win_id", "s_ep").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias(
            "sum_value_e6"
        ),
    )
    return _run_to_memory(agg, "stream_interval", "complete")


def view_click_join(
    ev: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """STREAM-STREAM inner join graph — the hardest streaming join
    class: each user's view events matched to their click events
    within ``horizon`` after the view. Both sides are unbounded, so
    BOTH carry watermarks and the join condition includes the time
    bound — that pair is what lets the state store EVICT: a buffered
    view can be dropped once the click-side watermark passes
    view_ts + horizon (without the time bound the state grows
    forever). Buffered-but-unmatched rows live in the CHECKPOINTED
    state store, so a kill/restart between microbatches loses nothing
    (tests/test_streaming.py kill-and-resume). ``ev`` is a streaming
    events frame (ts, event_id, user_id, event_type); the self-join
    reads it twice."""
    v = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") < F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("view_id", "click_id", "user_id")


def view_click_join_stream(
    spark: SparkSession, sf_dir: str, horizon: str = "1 hour"
) -> DataFrame:
    """Append-mode drain of ``view_click_join`` over the events
    table; on an availableNow replay the emitted pairs equal the
    batch self-join — the oracle's equivalence."""
    joined = view_click_join(stream_events(spark, sf_dir), horizon)
    return _run_to_memory(joined, "stream_ssjoin", "append")


class _capped_shuffle_partitions:
    """A streaming query pins spark.sql.shuffle.partitions at start
    and creates one state-store instance per partition — under a
    200-partition default the state-store setup dominates a small
    availableNow replay. Cap it around .start() and restore after
    (the running query keeps its pinned value)."""

    def __init__(self, spark: SparkSession, n: int = 16):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _run_to_memory(stream: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Drain ``stream`` into a memory sink and return its table.

    The query name (= the sink's temp-view name) is uuid-suffixed so
    two invocations in the same session can never collide and clobber
    each other's in-memory table (a timestamp-derived name could,
    within one millisecond). One view accumulates per streaming-query
    run — bounded by catalog size per session, and each is tiny (the
    drained result, already driver-visible by design of the sink)."""
    name = f"{prefix}_{uuid.uuid4().hex[:12]}"
    with _capped_shuffle_partitions(stream.sparkSession):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
        raise TimeoutError(f"stream {name} did not drain in 300s")
    return stream.sparkSession.table(name)


def windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1h window per event_type. ``complete``
    output on availableNow == the batch group-by (the equivalence the
    oracle asserts)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias(
                "sum_value_e6"
            ),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return _run_to_memory(agg, "win_counts", "complete").select(
        F.col("w.start").alias("hour"), "event_type", "sum_value_e6", "n"
    )


_SESS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("n_events", LongType()),
        StructField("event_types", StringType()),
    ]
)
_SESS_STATE = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
    ]
)


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer. State carries (last event epoch,
    sessions emitted so far) so a restarted/continued stream numbers
    sessions consistently."""
    (user_id,) = key
    last_ts, n_sessions = state.get if state.exists else (None, 0)
    rows = []
    cur: dict | None = None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        # Arrow may deliver a group as several chunks in arbitrary
        # order — order the whole group before walking it
        whole = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, etype in zip(whole["ts"], whole["event_type"]):
            epoch = int(ts.timestamp())
            if last_ts is None or epoch - last_ts > SESSION_GAP_S:
                if cur is not None:
                    rows.append(cur)
                n_sessions += 1
                cur = {
                    "user_id": user_id,
                    "session_id": n_sessions,
                    "session_start": ts,
                    "n_events": 0,
                    "types": set(),
                }
            if cur is None:  # continuation of a session from prior batch
                n_sessions += 1
                cur = {
                    "user_id": user_id,
                    "session_id": n_sessions,
                    "session_start": ts,
                    "n_events": 0,
                    "types": set(),
                }
            cur["n_events"] += 1
            cur["types"].add(etype)
            last_ts = epoch
    if cur is not None:
        rows.append(cur)
    state.update((last_ts, n_sessions))
    if rows:
        yield pd.DataFrame(
            [
                (
                    r["user_id"],
                    r["session_id"],
                    r["session_start"],
                    r["n_events"],
                    ",".join(sorted(r["types"])),
                )
                for r in rows
            ],
            columns=["user_id", "session_id", "session_start", "n_events", "event_types"],
        )


_LIVE_STATE = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("open_start", LongType()),  # epoch us; NULL = no open session
        StructField("open_n", LongType()),
        StructField("open_types", StringType()),
    ]
)


def _sessionize_live_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Event-time-timeout sessionizer: emits a session when a LATER
    event closes it (gap exceeded within data) OR when the watermark
    passes the session's gap deadline (timeout flush) — the live
    deployment shape the batch-replay sessionizer can't cover."""
    (user_id,) = key

    def row(n_sessions, start_us, n, types_csv):
        return pd.DataFrame(
            [
                (
                    user_id,
                    n_sessions,
                    pd.Timestamp(start_us, unit="us"),
                    n,
                    ",".join(sorted(set(types_csv.split(",")))) if types_csv else "",
                )
            ],
            columns=["user_id", "session_id", "session_start", "n_events", "event_types"],
        )

    if state.hasTimedOut:
        last_ts, n_sessions, open_start, open_n, open_types = state.get
        out = []
        if open_start is not None:
            out.append(row(n_sessions, open_start, open_n, open_types))
        state.update((last_ts, n_sessions, None, None, None))
        # state kept (counters) — no further timeout until new data
        yield from out
        return

    last_ts, n_sessions, open_start, open_n, open_types = (
        state.get if state.exists else (None, 0, None, None, None)
    )
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out = []
    if chunks:
        whole = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, etype in zip(whole["ts"], whole["event_type"]):
            us = int(ts.value // 1000)
            if last_ts is None or us - last_ts > SESSION_GAP_S * 1_000_000:
                if open_start is not None:
                    out.append(row(n_sessions, open_start, open_n, open_types))
                n_sessions += 1
                open_start, open_n, open_types = us, 0, ""
            if open_start is None:  # fresh after a timeout flush
                n_sessions += 1
                open_start, open_n, open_types = us, 0, ""
            open_n += 1
            open_types = f"{open_types},{etype}" if open_types else etype
            last_ts = us
    state.update((last_ts, n_sessions, open_start, open_n, open_types))
    if last_ts is not None:
        # flush deadline: gap after the newest event (ms for the API)
        state.setTimeoutTimestamp(last_ts // 1000 + SESSION_GAP_S * 1000)
    yield from out


def sessionize_live(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Wire the live sessionizer over a STREAMING events DataFrame
    (ts/event_id/user_id/event_type columns): watermarked, event-time
    timeouts, append output. Sessions appear as soon as they close —
    by gap or by watermark — instead of only at availableNow drain."""
    ev = events.withWatermark("ts", watermark).select(
        "user_id", "ts", "event_id", "event_type"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_live_fn,
        outputStructType=_SESS_OUT,
        stateStructType=_LIVE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _batch_committer(table_path: str):
    """foreachBatch sink with sink-side idempotence: each microbatch
    commits ONE snapshot tagged with its batch_id; a replayed batch
    (failure between sink write and checkpoint commit — the half of
    exactly-once the engine must supply) finds its id already in the
    committed chain and does nothing. The snapshot pointer swap is
    atomic, so readers never see a partial batch."""
    from georaster_spark.sources import icetable

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        try:
            done = {
                m.get("extra", {}).get("batch_id")
                for m in icetable.committed_chain(table_path)
            }
        except FileNotFoundError:
            done = set()
        if batch_id in done:
            return
        # complete-mode aggregate: every batch carries the full
        # result, so the commit is an overwrite snapshot
        icetable.write_table(
            batch_df, table_path, mode="overwrite", extra={"batch_id": batch_id}
        )

    return commit


def stream_to_table(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint_dir: str
) -> DataFrame:
    """Watermarked windowed aggregate streamed into the E10 table
    layer with exactly-once delivery (checkpoint for source progress
    + idempotent batch-tagged snapshot commits for the sink).

    Returns the committed table contents; on a static input one
    availableNow replay lands the batch group-by result exactly."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias(
                "sum_value_e6"
            ),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "sum_value_e6", "n")
    )
    with _capped_shuffle_partitions(spark):
        q = (
            agg.writeStream.foreachBatch(_batch_committer(table_path))
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
        raise TimeoutError("stream_to_table did not drain in 300s")

    from georaster_spark.sources import icetable

    return icetable.read_table(spark, table_path)


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via applyInPandasWithState. On a static
    input (one availableNow replay) the emitted sessions equal the
    batch window-function sessionizer — asserted by the oracle."""
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    sess = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        # static-replay harness: every session closes within the one
        # availableNow batch, so no timeout is needed. A live
        # deployment flushes open sessions via EventTimeTimeout +
        # watermark instead (ProcessingTimeTimeout would keep
        # scheduling drain batches under availableNow).
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(sess, "sessions", "append")


def warc_pages_stream(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Streaming crawl ingest (E15 × the WARC source): ``.warc.gz``
    shards landing in a watched directory parse incrementally into
    page rows — the live form of ``jobs/crawl_ingest_job.py``.

    The fixture shards are staged into a deterministic symlink dir
    (same contract as ``stream_table``: FileStreamSource needs a
    directory, and checkpoint restarts must resolve the same
    basePath). Each micro-batch delivers whole files through the
    ``binaryFile`` source; the SAME member-walk/parse kernels as the
    batch reader run inside a ``mapInPandas`` over the stream, so
    batch and streaming ingest can never drift. On a static directory
    one availableNow replay equals the batch read — gated by the
    ``stream_warc`` oracle, which re-derives every field from the
    closed-form generator.

    At scale: a crawl drop-zone of ~1 GB shards streams with
    file-granular parallelism per micro-batch (splits within a shard
    need the CDX planner, which is the batch path's job); page bytes
    stay inside the scan stage — the memory sink here receives only
    the small projected columns."""
    import hashlib
    import os
    import tempfile

    from georaster_spark.sources.warc import iter_warc_members, parse_warc_member

    tag = hashlib.md5("|".join(sorted(paths)).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"stream_warc_{tag}")
    os.makedirs(d, exist_ok=True)
    for p in paths:
        link = os.path.join(d, os.path.basename(p))
        if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(p):
            os.unlink(link)
        if not os.path.lexists(link):
            os.symlink(p, link)

    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc.gz")
        .load(d)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "ts_s", "lang", "http_status", "payload"]
        for pdf in batches:
            out = {c: [] for c in cols}
            for path, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                for off, _mlen, rec in iter_warc_members(buf, path):
                    (rtype, url, ts_s, lang, status, _ct, payload) = (
                        parse_warc_member(rec, path, off)
                    )
                    if rtype != "response":
                        continue
                    for k, v in zip(
                        cols, (url, ts_s, lang, status, payload)
                    ):
                        out[k].append(v)
            yield pd.DataFrame(out)

    pages = raw.mapInPandas(
        kernel,
        schema=(
            "url string, ts_s long, lang string, "
            "http_status int, payload binary"
        ),
    )
    text = F.regexp_extract(
        F.col("payload").cast("string"), "<body>(.*)</body>", 1
    )
    projected = pages.select(
        "url",
        F.col("ts_s").cast("long").alias("ts_s"),
        "lang",
        F.col("http_status").cast("long").alias("http_status"),
        F.length("payload").cast("long").alias("n_bytes"),
        text.alias("text"),
        F.conv(F.substring(F.md5(text), 1, 15), 16, 10)
        .cast("long")
        .alias("text_h"),
    )
    return _run_to_memory(projected, "stream_warc", "append")
