"""Parity of the translate-based hot-path tricks with their regex
semantics on arbitrary (incl. unicode/surrogate-adjacent) input.

The engine replaces java.util.regex on hot paths with translate-based
char-map walks (~10x cheaper; BENCH/BASELINE.md round-2 notes). Those
rewrites are only safe if they agree with the regex they replaced on
EVERY input, not just normalized keys — this pins:

  has_nonkey_chars(k)  ==  k RLIKE '[^a-z0-9 ]'
  compact_form(k)      ==  regexp_replace(k, '[^a-z0-9 ]', '')

over a deterministic random corpus spanning ascii, punctuation,
multi-byte unicode, combining marks, and empty strings — one DataFrame,
two column formulations, zero mismatching rows.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark.blocking import compact_form, has_nonkey_chars


def _corpus() -> list[str]:
    rng = random.Random(1234)
    alphabets = [
        "abcdefghijklmnopqrstuvwxyz0123456789 ",
        "abc -_'.,;:!?#@/\\()[]{}",
        "àéîöü日本語中文字émoji™§±",
        "a0 ~`^&*+=|<>\"  ",  # incl. non-breaking/thin space
    ]
    out = ["", " ", "a", "-", "é", "abc def", "acti-vate", "a.b,c"]
    for _ in range(400):
        alpha = rng.choice(alphabets)
        out.append(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30)))
        )
    return out


def test_translate_gate_matches_regex(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": _corpus()}))
    bad = df.select(
        "k",
        has_nonkey_chars(F.col("k")).alias("gate"),
        F.col("k").rlike("[^a-z0-9 ]").alias("re_gate"),
        compact_form(F.col("k")).alias("cf"),
        F.regexp_replace(F.col("k"), "[^a-z0-9 ]", "").alias("re_cf"),
    ).where(
        (F.col("gate") != F.col("re_gate")) | (F.col("cf") != F.col("re_cf"))
    )
    rows = bad.collect()
    assert not rows, [(r["k"], r["gate"], r["re_gate"], r["cf"], r["re_cf"])
                      for r in rows[:5]]
