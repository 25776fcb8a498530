"""HTML → text extraction for web-crawl corpora: tag stripping,
script/style/comment removal, entity unescaping, and a markup-ratio
quality signal (boilerplate-heavy pages score high and get filtered).

Beyond-reference operator family (the reference has no text surface);
the first cleaning stage of a CommonCrawl-style pipeline, upstream of
:mod:`jodie_spark.functions.text` quality scoring.

Scale shape: every function is a chain of Catalyst ``regexp_replace``
/ ``replace`` expressions — whole-stage codegen, no UDFs, no shuffle;
cleaning cost is a per-row map over the scan. Patterns deliberately
avoid backreferences and lookarounds so the exact same regexes run
under Java regex (Spark) and RE2 (DuckDB/Trino) — the oracle mirrors
them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strip_html", "markup_ratio", "with_extracted_text"]

# (entity, replacement) in application order: '&amp;' must come LAST so
# double-escaped text ('&amp;lt;') unescapes one level per pass, never
# two (standard single-pass entity decoding).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML fragment: drop ``<script>``/``<style>``
    elements WITH their content, then comments, then every remaining
    tag; unescape the common entities; collapse whitespace.

    Pass order matters: script/style bodies may contain bare ``<``
    (``if (a < b)``) that the generic tag pass would mis-parse, so the
    element passes run first on the raw markup."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for entity, repl in _ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(repl))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def markup_ratio(raw: Column | str, text: Column | None = None) -> Column:
    """Fraction of the raw page that is markup: ``1 - len(extracted) /
    len(raw)``. Near 1.0 → boilerplate/navigation page; near 0 →
    text-dense page worth keeping. ``text`` reuses an
    already-extracted column instead of stripping twice."""
    r = F.col(raw) if isinstance(raw, str) else raw
    t = strip_html(r) if text is None else text
    return F.round(
        (F.length(r) - F.length(t)) / F.greatest(F.length(r), F.lit(1)), 6
    )


def with_extracted_text(df, html_col: str, text_col: str = "extracted_text"):
    """DataFrame helper: add ``text_col`` (visible text) and
    ``{text_col}_markup_ratio`` in one projection."""
    extracted = strip_html(html_col)
    return df.withColumn(text_col, extracted).withColumn(
        f"{text_col}_markup_ratio", markup_ratio(html_col, F.col(text_col))
    )
