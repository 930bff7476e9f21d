"""Chunking round-trip byte-identity (the reference's hard contract)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark.chunking import (
    bpe_ish_token_count,
    split_char_budget,
    split_token_budget,
    ws_token_count,
)
from pelinker_spark.synth import kb_rows, page_record


def _texts(spark):
    kb = kb_rows(20)
    texts = [page_record(42, i, kb)["text"] for i in range(40)]
    texts += ["", "one", "a  b", "x" * 300, ("word " * 200).strip()]
    return spark.createDataFrame(pd.DataFrame({"text": texts}))


def test_char_budget_roundtrip(spark):
    df = _texts(spark)
    out = df.select(
        "text", split_char_budget(F.col("text"), 80).alias("chunks")
    ).toPandas()
    for _, r in out.iterrows():
        assert "".join(r.chunks) == r.text  # byte-identical round trip
        assert all(len(c) <= 80 for c in r.chunks)


def test_char_budget_adversarial_tail(spark):
    """Regression (ADVICE r1): a short token followed by long spaceless
    runs (URLs / base64 on web text) used to exhaust the aggregate's step
    budget and silently drop the tail, violating byte identity. Worst-case
    consumption is max_chars+1 chars per 2 steps ("a " + hard cut)."""
    texts = [
        ("a " + "x" * 78) * 70,          # alternating worst case, ~5.6k chars
        "a " + "y" * 10603,               # 10605 chars, the reported repro
        ("b " + "z" * 79 + " ") * 50,
        "w" * 4001,
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    out = df.select(
        "text", split_char_budget(F.col("text"), 80).alias("chunks")
    ).toPandas()
    for _, r in out.iterrows():
        assert "".join(r.chunks) == r.text
        assert all(len(c) <= 80 for c in r.chunks)


def test_token_budget_roundtrip(spark):
    df = _texts(spark)
    out = df.select(
        "text", split_token_budget(F.col("text"), 16).alias("chunks")
    ).toPandas()
    for _, r in out.iterrows():
        assert "".join(r.chunks) == r.text
        for c in r.chunks:
            assert len([t for t in c.split(" ") if t]) <= 16


def test_token_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["hello world", "a-b c3d!  e", ""]})
    )
    r = df.select(
        ws_token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert r[0]["ws"] == 2 and r[0]["bpe"] == 2
    # "a-b c3d! e" -> a,-,b,c,3,d,!,e = 8 BPE-ish tokens / 3 ws tokens
    assert r[1]["ws"] == 3 and r[1]["bpe"] == 8
    assert r[2]["ws"] == 0 and r[2]["bpe"] == 0


def test_char_budget_random_unicode(spark):
    """Byte identity + cap over a randomized corpus (mixed unicode,
    pathological whitespace runs) at several budgets, incl. a tiny one
    where nearly every token needs a hard cut."""
    import random

    rng = random.Random(77)
    alphabets = [
        "abc def  ",
        "àéî 日本語  中文 ",
        "a-b.c,d;e  !? ",
        "  x y ",  # exotic spaces are CONTENT, not separators
    ]
    texts = [
        "".join(rng.choice(rng.choice(alphabets)) for _ in range(rng.randint(0, 120)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    for budget in (3, 17, 80):
        out = df.select(
            "text", split_char_budget(F.col("text"), budget).alias("chunks")
        ).toPandas()
        for _, r in out.iterrows():
            assert "".join(r.chunks) == r.text, (budget, r.text)
            assert all(len(c) <= budget for c in r.chunks), (budget, r.text)
