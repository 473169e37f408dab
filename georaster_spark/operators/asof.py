"""As-of (nearest-prior-event) join — the shuffle-free-right-side
pattern that scales where a range join cannot.

Semantics: for each LEFT row, attach the latest RIGHT row with
``right.ts <= left.ts`` for the same key (ties: the right row wins —
"at or before").

A naive theta-join (``l.key = r.key AND r.ts <= l.ts`` + max) is a
broadcast-nested-loop at worst and an exploding range join at best.
The scalable plan is the **union trick**: tag both sides, union,
sort within key by (ts, tag), and carry the last right-side value
forward with ``last(..., ignorenulls=True)`` over an unbounded
preceding window — ONE shuffle on the key, linear work, no row
blowup. Skewed keys are handled by the same salting machinery as the
spatial join (operators/spatial_join.py: salted_repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right``
    row at-or-before its timestamp (NULLs when none). ``right_cols``
    are the right-side payload columns to carry (renamed as-is; must
    not collide with left columns)."""
    lt = left.withColumn("_tag", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        on, ts, *right_cols
    ).withColumn("_tag", F.lit(0))
    for c in left.columns:
        if c not in (on, ts) and c not in right_cols:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    both = lt.select(sorted(lt.columns)).unionByName(rt.select(sorted(rt.columns)))

    # right rows (_tag 0) sort before left rows at equal ts → "at or
    # before" inclusive semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.select(
        *[c for c in both.columns if c not in right_cols],
        *[
            F.last(F.when(F.col("_tag") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in right_cols
        ],
    )
    return filled.where(F.col("_tag") == 1).drop("_tag")


def bucketized_interval_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "s_ep",
    end_col: str = "e_ep",
    bucket_seconds: int = 7200,
    broadcast_intervals: bool | None = None,
) -> DataFrame:
    """Interval (range) join without a nested-loop: rows of ``left``
    matched to every interval ``[start, end)`` that contains them.

    A naive ``ts BETWEEN s AND e`` theta-join plans as a
    BroadcastNestedLoopJoin — O(|left| * |intervals|) compares. The
    standard scale rewrite: quantize time into fixed buckets, EXPLODE
    each interval into the buckets it overlaps (an interval of length
    <= bucket_seconds covers at most 2), equi-join on the bucket, then
    re-apply the exact predicate. The big side computes one integer
    bucket per row and is equi-joined (hashable, broadcastable,
    AQE-optimizable); work scales with matches, not the cross
    product. ``start_col``/``end_col`` are integer epoch seconds.

    ``broadcast_intervals``: True forces a broadcast hint on the
    exploded interval side (right for dimension-sized tables — the
    interval_join / stream_interval queries pass True); None (the
    default) leaves the strategy to Catalyst/AQE so a caller with a
    LARGE interval table gets a shuffled hash join instead of a
    driver-collected broadcast OOM.
    """
    b_left = left.withColumn(
        "_bucket", F.expr(f"unix_timestamp({ts_col}) div {bucket_seconds}")
    )
    b_iv = (
        # empty/inverted intervals ([s, e) with e <= s) match nothing;
        # dropping them here also keeps F.sequence ascending (an
        # unguarded e <= s would emit a DESCENDING bucket list whose
        # junk rows only the residual predicate would remove)
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_buckets",
            # every bucket the interval overlaps (end exclusive) — an
            # interval of length <= bucket_seconds yields at most 2
            F.sequence(
                F.expr(f"{start_col} div {bucket_seconds}"),
                F.expr(f"({end_col} - 1) div {bucket_seconds}"),
            ),
        )
        .withColumn("_bucket", F.explode("_buckets"))
        .drop("_buckets")
    )
    if broadcast_intervals:
        b_iv = F.broadcast(b_iv)
    ep = F.unix_timestamp(F.col(ts_col))
    return (
        b_left.join(b_iv, "_bucket")
        .where((ep >= F.col(start_col)) & (ep < F.col(end_col)))
        .drop("_bucket")
    )
