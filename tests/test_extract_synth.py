"""Synthetic table + extraction invariants.

Per-row invariant (BASELINE.json input_hint): byte-identical extracted text
per url — extract(html) == text for every synthetic page, verified both in
pure Python and through the Spark pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pelinker_spark.extract import extract_text, extract_text_py
from pelinker_spark.synth import kb_rows, page_record, render_html, web_pages


def test_page_record_deterministic():
    kb = kb_rows(20)
    a = page_record(42, 7, kb)
    b = page_record(42, 7, kb)
    assert a == b
    c = page_record(43, 7, kb)
    assert c["text"] != a["text"]


def test_extract_roundtrip_py():
    kb = kb_rows(20)
    for i in range(50):
        rec = page_record(42, i, kb)
        assert extract_text_py(rec["html"]) == rec["text"]


def test_extract_handles_script_and_entities():
    html = (
        b"<html><head><script>var x = '<p>no</p>';</script></head>"
        b"<body><p>a &amp; b &lt;c&gt;</p><style>p{}</style></body></html>"
    )
    assert extract_text_py(html) == "a & b <c>"


def test_web_pages_spark_roundtrip(spark):
    pages = web_pages(spark, 200, seed=42, partitions=4)
    bad = (
        pages.withColumn("extracted", extract_text(F.col("html")))
        .where(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0
    assert pages.count() == 200
    # determinism across different partitioning
    h1 = (
        web_pages(spark, 200, seed=42, partitions=2)
        .select(F.md5(F.concat_ws("|", "url", "text", "lang")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )
    h2 = (
        web_pages(spark, 200, seed=42, partitions=8)
        .select(F.md5(F.concat_ws("|", "url", "text", "lang")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )
    assert h1 == h2


def test_extract_roundtrip_property():
    """The input_hint invariant over the FULL text space, not just the
    synth corpus: for any unicode text, extract(render(text)) recovers
    text.strip() byte-for-byte — including text containing raw markup
    ('<p>', '&amp;', '</body>'), which render escapes and extract must
    invert exactly (entity legs), and control/astral characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=400))
    def prop(t):
        assert extract_text_py(render_html("https://e.org/x", t)) == t.strip()

    prop()
    # targeted adversarial cases beyond what st.text tends to generate
    for t in [
        "<script>alert(1)</script>",
        "</body></html><body>",
        "a &amp; b &lt;c&gt; &notanentity; &#65;",
        "  \t\n leading and trailing \r\n ",
        "nested <p><p></p></p> tags & '\"quotes\"'",
    ]:
        assert extract_text_py(render_html("https://e.org/x", t)) == t.strip()
