"""Byte-identical HTML → text extraction as an Arrow-batched pandas UDF.

The extractor is a pure function of the html bytes — no external parser
library (no bs4/lxml version drift, SURVEY.md §7.3.1), no locale
dependence. It inverts synth.render_html exactly: for every synthetic page,
``extract_text(html) == text`` byte-for-byte (the per-row invariant in
BASELINE.json input_hint; generalizes the reference's chunk round-trip
contract, pelinker/util.py:528-585 + test_chunking_layers.py:36-52).

On real Common-Crawl HTML the same interface would host a real extractor;
the contract (pure function, bytes in → str out, pandas UDF batch shape)
is the part the engine depends on.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = re.compile(r"<[^>]+>")
_BLOCK_RE = re.compile(
    r"<(?:script|style)\b[^>]*>.*?</(?:script|style)>", re.S | re.I
)


def extract_text_py(html_bytes: bytes) -> str:
    """Pure-Python extraction: drop script/style, strip tags, unescape
    entities. Deterministic across platforms (regex on unicode str)."""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _BLOCK_RE.sub(" ", s)
    # keep only body content if a body tag exists
    m = re.search(r"<body[^>]*>(.*?)</body>", s, re.S | re.I)
    if m:
        s = m.group(1)
    s = _TAG_RE.sub("", s)
    s = _htmlmod.unescape(s)
    return s.strip()


@F.pandas_udf(T.StringType())
def _extract_text_udf_det(html_col: pd.Series) -> pd.Series:
    """Arrow-batched extraction (Series[bytes] → Series[str])."""
    return html_col.map(extract_text_py)


# Marked non-deterministic (round 6): extract_stage filters on the UDF's
# output (non-empty text), and filter pushdown duplicates a deterministic
# UDF into two ArrowEvalPython nodes — every page was parsed twice
# (verified in the link-pipeline mentions plan). The function is pure, so
# results are unchanged; callers that filter on upstream columns (lang)
# must now filter *before* this projection — link_pipeline does.
extract_text_udf = _extract_text_udf_det.asNondeterministic()


def extract_text(html_col: Column) -> Column:
    return extract_text_udf(html_col)
