"""Text/markup table functions — the UDTF corner of the UDF surface
(SURVEY.md §2.3 'UDF/UDAF/UDTF').

``HtmlTags`` is a Python UDTF (Spark 4 ``@udtf``): one input row →
many output rows, the generator shape built-ins can't express when
the expansion needs imperative parsing. It tokenizes the opaque
``html BINARY`` column into its tag sequence — the first step of any
webtext extraction pipeline (the real extractor would yield text
nodes; the synthetic corpus has deterministic markup, so tags are
the checkable part).

UDTFs are the Python slow path — keep them off the hot path; this
exists to prove the surface end-to-end (registration, lateral join,
binary input, row expansion) with an exact DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TAG_RE = re.compile(r"</?([a-z]+)>")


@udtf(returnType="tag_idx int, tag string")
class HtmlTags:
    """Yield (position, tag_name) for every opening/closing tag."""

    def eval(self, html):  # html: bytes (BinaryType) or str
        if html is None:
            return
        s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else str(html)
        for i, m in enumerate(_TAG_RE.finditer(s)):
            yield i, m.group(1)


def register(spark) -> None:
    spark.udtf.register("html_tags", HtmlTags)
