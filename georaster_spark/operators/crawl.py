"""Crawl-pipeline operators: robots.txt verdicts and a politeness
frontier scheduler.

These are the two crawl-side controls every Common-Crawl-style
pipeline runs BEFORE fetch/ingest (the reference repo starts at the
raster/tile layer; these extend the engine upstream along the
webtext axis, like ``sources/warc.py`` does for ingest):

``robots_verdicts``
    RFC 9309 path-prefix matching: for each URL, the most specific
    (longest) matching rule for its host wins; on a length tie an
    Allow rule beats a Disallow; a URL with no matching rule is
    allowed. Matching is byte-prefix (the RFC's core rule) — no
    wildcard support, which callers must pre-expand.

``crawl_frontier``
    Per-host politeness scheduling: URLs are ranked by priority
    within each host, capped at a per-host budget, and assigned
    fetch slots ``slot * crawl_delay`` apart.

Scale design (100 TB crawl frontier):
  - robots rules are ~KB per host and the rules table is orders of
    magnitude smaller than the URL list → the rule join is an
    equi-join on ``host`` that Spark broadcasts when the rules fit
    (AQE decides; callers can wrap with ``F.broadcast``). The
    winner-per-URL step is a ``max(struct(...))`` AGGREGATE, not a
    window — map-side partial aggregation absorbs URL-heavy hosts
    before the shuffle.
  - the frontier is ONE hash shuffle on ``host``; the per-host
    ``row_number`` filter is a rank-limit Spark plans as
    WindowGroupLimit, so per-task state is bounded by the budget,
    not the host's URL count. A hot host does serialize into one
    task — that is the SEMANTICS of politeness (one host = one
    fetch queue), and the budget cap bounds the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_verdicts(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Longest-match robots verdict per URL.

    ``urls``: (doc_id, host, path); ``rules``: (host, prefix, allow).
    Returns (doc_id, host, path, allowed, rule) where ``rule`` is the
    winning rule's prefix or '' for the default-allow case.

    The winner is picked with ``max(struct(len, allow, prefix))`` —
    lexicographic struct ordering gives longest prefix first, then
    Allow over Disallow (RFC 9309 §2.4.2), then prefix text as a
    deterministic tiebreak. The rules join is a LEFT broadcast join
    (no shuffle — a no-match URL survives as one all-null rule row,
    whose all-null struct loses to any real match and decodes to the
    default-allow verdict), so the whole operator is broadcast-join
    + ONE aggregate with map-side partial combine. No window, no
    second join-back.
    """
    j = urls.join(
        rules,
        (urls["host"] == rules["host"])
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    win = F.max(
        F.struct(
            F.length("prefix").alias("l"),
            F.col("allow").cast("int").alias("a"),
            F.col("prefix").alias("p"),
        )
    ).alias("win")
    return (
        j.groupBy("doc_id", urls["host"], "path")
        .agg(win)
        .select(
            "doc_id",
            "host",
            "path",
            F.coalesce(F.col("win.a").cast("boolean"), F.lit(True)).alias(
                "allowed"
            ),
            F.coalesce(F.col("win.p"), F.lit("")).alias("rule"),
        )
    )


def crawl_frontier(
    urls: DataFrame,
    budget: int,
    epoch0: int,
) -> DataFrame:
    """Politeness-scheduled fetch plan.

    ``urls``: (doc_id, host, priority, delay_s) with ``delay_s``
    constant per host (the host's crawl-delay). Within each host,
    URLs are ordered by (priority desc, doc_id) and the top
    ``budget`` get slots 0..budget-1; ``fetch_ts_s`` spaces slots
    ``delay_s`` apart from ``epoch0``. One shuffle on host; the
    rank filter plans as WindowGroupLimit (bounded per-task state).
    """
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    # filter on row_number() itself (rn <= budget) so Catalyst plans
    # the rank-limit as WindowGroupLimit — per-task state is the
    # budget, not the host's URL count; slot derives afterwards
    return (
        urls.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= budget)
        .select(
            "doc_id",
            "host",
            F.col("priority").cast("long").alias("priority"),
            (F.col("rn") - 1).cast("long").alias("slot"),
            (F.lit(epoch0) + (F.col("rn") - 1) * F.col("delay_s"))
            .cast("long")
            .alias("fetch_ts_s"),
        )
    )
