"""Boilerplate-strip / text-extraction stage.

k-gap's ingest converts each harvested LDES member to RDF inside the
spawned ``ldes2sparql`` container (reference: ``ldes-consumer/app.py:
361-383``); our analog converts each raw web page (``html: binary``)
into clean main-content text. The north rule demands trafilatura-style
readability extraction that is **byte-identical per url across runs and
partitionings**, so the extractor is a *pure function of the html bytes
only* — no wall clock, no per-partition state, no library whose output
varies by version. It is a small deterministic readability:

1. decode UTF-8 (errors → U+FFFD, deterministic),
2. drop non-content subtrees: ``script/style/noscript/template/svg``
   and boilerplate landmarks ``nav/header/footer/aside`` plus elements
   marked ``class="ad..."``,
3. scope to ``<main>`` (else ``<article>``, else ``<body>``, else all),
4. block-level tags become newlines, inline tags vanish,
5. entities unescaped, whitespace canonicalized (single spaces, single
   ``\\n`` between blocks, stripped).

Spark-side it runs as an **iterator-style Arrow pandas UDF** — one
Python worker per core streaming Arrow batches (size tuned in
``session.ARROW_BATCH_ROWS``), never per-row Python (input_hint).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Subtrees that never contribute content. Matched non-greedily with the
# closing tag; nested same-name tags do not occur in these elements in
# practice (and the regex fallback of dropping to the first close is
# still deterministic).
_DROP_SUBTREE = re.compile(
    rb"(?is)<(script|style|noscript|template|svg|nav|header|footer|aside)\b"
    rb".*?</\1\s*>"
)
# Elements explicitly marked as ads: <div class="ad ...">...</div>.
# Exact ad-token alternation, NOT \bad[a-z]*\b — that matched
# "address"/"admin-bar"/"adaptive" classes and deleted real content.
# Known limitation (unchanged): the non-greedy close stops at the
# first </div>, so an ad div containing nested divs truncates early —
# balanced matching is beyond a deterministic regex pass, and the
# byte-identical-extraction invariant pins current behavior.
_DROP_AD = re.compile(
    rb'(?is)<div\b[^>]*class="[^"]*\b(?:ad|ads|advert[a-z]*|adsense|'
    rb'ad-[a-z0-9-]+)\b[^"]*"[^>]*>.*?</div\s*>'
)
_COMMENT = re.compile(rb"(?s)<!--.*?-->")

_MAIN = re.compile(rb"(?is)<main\b[^>]*>(.*?)</main\s*>")
_ARTICLE = re.compile(rb"(?is)<article\b[^>]*>(.*?)</article\s*>")
_BODY = re.compile(rb"(?is)<body\b[^>]*>(.*?)</body\s*>")

_BLOCK_TAG = re.compile(
    r"(?is)</?(p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|"
    r"blockquote|pre|figure|figcaption|main|body|html|head|title|form|br|hr)\b[^>]*>"
)
_ANY_TAG = re.compile(r"(?s)<[^>]+>")
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n\s*\n+|\n[ \t]+|[ \t]+\n")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Deterministic readability extraction: html bytes → clean text.

    Pure function of its input; returns None for null input and ""
    for pages with no extractable content.
    """
    if html_bytes is None:
        return None
    raw = bytes(html_bytes)
    raw = _COMMENT.sub(b"", raw)
    raw = _DROP_SUBTREE.sub(b"", raw)
    raw = _DROP_AD.sub(b"", raw)

    scope = None
    for pat in (_MAIN, _ARTICLE, _BODY):
        m = pat.search(raw)
        if m:
            scope = m.group(1)
            break
    if scope is None:
        scope = raw

    text = scope.decode("utf-8", errors="replace")
    text = _BLOCK_TAG.sub("\n", text)
    text = _ANY_TAG.sub("", text)
    text = _html.unescape(text)
    text = _WS_RUN.sub(" ", text)
    # canonicalize newlines: no blank lines, no edge spaces per line
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


@F.pandas_udf(T.StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched extraction (iterator form: one-time worker setup,
    streaming batches — the sanctioned custom-code hook per SURVEY §2.11
    D1, mirroring sembench's transform-step scripts,
    docs/components/sembench.md:214-217)."""
    for series in batches:
        yield series.map(extract_text)


def extracted_text_col(html_col: Column) -> Column:
    return extract_text_udf(html_col)


def with_extracted_text(pages: DataFrame, out_col: str = "text") -> DataFrame:
    """web_pages → same frame with ``text`` guaranteed populated.

    Pages that already carry pre-extracted ``text`` keep it (the fixture
    guarantees it equals ``extract_text(html)``; the invariant test
    enforces that); null ``text`` rows run the UDF.

    Split-and-union, NOT ``when(text.isNull(), udf(html))``: Spark pulls
    Python UDFs out of conditional expressions into an unconditional
    ArrowEvalPython node, which would ship EVERY page's html bytes
    through Arrow and run the extractor on rows that don't need it. The
    two branches scan with complementary pushed-down IsNull filters, so
    at 100 TB only the unextracted fraction ever crosses the Python
    boundary.
    """
    cols = pages.columns
    have = pages.filter(F.col("text").isNotNull()).withColumn(out_col, F.col("text"))
    need = pages.filter(F.col("text").isNull()).withColumn(
        out_col, extract_text_udf(F.col("html"))
    )
    return have.select(*cols_out(cols, out_col)).unionByName(
        need.select(*cols_out(cols, out_col))
    )


def cols_out(cols: list[str], out_col: str) -> list[str]:
    return cols if out_col in cols else [*cols, out_col]
