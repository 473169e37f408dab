"""Web/URL column functions for webtext pipelines.

``canonical_url`` is the URL-canonicalization step of a crawl dedup
pipeline (the same normalizations CommonCrawl-style pipelines apply
before URL-level dedup): pure Column algebra — every step is a
built-in string function, so the whole expression stays inside
WholeStageCodegen and costs one projection, no Python, no shuffle.

Every regex is RE2-compatible (no lookarounds) so a DuckDB oracle
can apply the IDENTICAL pattern with the 'g' flag; Spark's
``regexp_replace`` is global by default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters removed during canonicalization, with their
# leading '?' or '&' separator (RE2-safe: no lookbehind)
TRACKING_PARAM_RE = r"[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical dedup key for a URL.

    Steps, in order:
      1. strip the scheme (``http://`` / ``https://``)
      2. lowercase the host (first path segment), strip a leading
         ``www.`` and a default ``:80`` / ``:443`` port — the path
         and query keep their case (paths are case-sensitive)
      3. drop the fragment (``#...``)
      4. remove tracking parameters (``utm_*``, ``fbclid``,
         ``gclid``) with their separator
      5. strip one trailing ``/``

    Note on step 4: a non-tracking parameter that FOLLOWED a removed
    leading tracking parameter keeps its ``&`` separator (RE2 has no
    lookbehind to re-promote it to ``?``). For dedup this is
    harmless: the same canonicalizer is applied to every URL, so
    equal inputs still map to equal keys.
    """
    u = F.regexp_replace(url, r"^https?://", "")
    # host = everything before the first '/', '?' or '#' (a URL may
    # carry a query or fragment with no path at all)
    host = F.regexp_extract(u, r"^[^/?#]*", 0)
    rest = F.substr(u, F.length(host) + F.lit(1))
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    u = F.concat(host, rest)
    u = F.regexp_replace(u, r"#.*", "")
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "")
    return F.regexp_replace(u, r"/$", "")
