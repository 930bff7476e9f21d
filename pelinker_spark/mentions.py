"""Mention-candidate generation — pure JVM-side column algebra.

Reference semantics (SURVEY.md §2 W4/M3, pelinker/onto.py:146-156,
util.py:801-822): whitespace-normalize, split into sentences, slide word
windows of width 1/2/3 over each sentence, keep windows that pass the
keep-predicate (no empty-normalizing token, not all stopwords), and key
each window by its normalized surface form (the blocking key).

Everything here is Catalyst-visible higher-order-function algebra
(split / transform / aggregate / posexplode) — whole-stage-codegen'd, zero
Python, zero shuffle. Char offsets (a, b sentence-local; a_abs, b_abs
doc-global) are exact over the whitespace-normalized text and computed
array-side with running-sum aggregates rather than a window function, so
mention generation is a single narrow stage.

Output schema mirrors the reference mention parquet
(pelinker/io/parquet.py:23-38) with pmid→url.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textnorm import blocking_key_col, norm_token_col, tokenize_col, window_is_valid_col

MAX_WINDOW = 3  # W1/W2/W3 — reference pelinker/onto.py:12-16


def _starts(arr: Column) -> Column:
    """Running char offsets for an array of strings joined by single
    spaces: starts[i] = sum(len+1 for j<i); size = n+1 (last = total+1)."""
    return F.aggregate(
        arr,
        F.array(F.lit(0)),
        lambda acc, s: F.concat(
            acc, F.array(F.element_at(acc, -1) + F.length(s) + F.lit(1))
        ),
    )


def normalize_ws(text: Column) -> Column:
    """Whitespace-normalize (reference util.py:304-313) — after this, char
    offsets computed from token lengths are exact."""
    return F.regexp_replace(F.trim(text), r"\s+", " ")


def split_sentences(text: Column) -> Column:
    """array<string> of sentences (split on ./!/? followed by space)."""
    return F.filter(
        F.split(text, r"(?<=[.!?])\s+"), lambda s: F.trim(s) != ""
    )


def generate_mentions(pages: DataFrame, windows: tuple[int, ...] = (1, 2, 3),
                      lang: str | None = "en",
                      extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """pages(url, text, ...) → mention candidates.

    Output: url, itext, ichunk, wg, mention, key, a, b, a_abs, b_abs
      - wg: window width (word grouping)
      - key: normalized blocking key
      - a,b: half-open char span within the normalized sentence
      - a_abs,b_abs: half-open char span within the normalized document
    extra_cols are threaded through unchanged (e.g. warc_ts for streaming
    event-time windows — stream-stream joins can't re-attach them later).
    """
    df = pages
    if lang is not None and "lang" in df.columns:
        df = df.where(F.col("lang") == lang)

    df = df.select(
        "url",
        *extra_cols,
        F.lit(0).cast("long").alias("itext"),
        split_sentences(normalize_ws(F.col("text"))).alias("sents"),
    )
    # doc-global offset of each sentence (array-side running sum, no shuffle);
    # _starts yields n+1 entries — slice to n so arrays_zip stays aligned
    df = df.select(
        "url",
        *extra_cols,
        "itext",
        F.posexplode(
            F.arrays_zip(
                F.col("sents"),
                F.slice(_starts(F.col("sents")), 1, F.size("sents")).alias("soff"),
            )
        ).alias("ichunk", "z"),
    ).select(
        "url",
        *extra_cols,
        "itext",
        F.col("ichunk").cast("long").alias("ichunk"),
        F.col("z.sents").alias("sent"),
        F.col("z.soff").alias("sent_off"),
    )

    toks = tokenize_col(F.col("sent"))
    df = df.select(
        "url", *extra_cols, "itext", "ichunk", "sent_off",
        toks.alias("toks"),
        _starts(toks).alias("tstarts"),
    )

    # one struct per (window width, start index), flattened then exploded.
    # NB: the lambda must be unary — a second parameter would be bound by
    # Spark to the element index (binary transform form), so capture w via
    # a closure factory.
    def _window_struct(w: int):
        def fn(i):
            return F.struct(
                F.lit(w).alias("wg"),
                F.array_join(F.slice("toks", i + 1, w), " ").alias("mention"),
                F.transform(F.slice("toks", i + 1, w), norm_token_col).alias("normed"),
                F.element_at("tstarts", i + 1).cast("long").alias("a"),
                (F.element_at("tstarts", i + F.lit(w) + 1) - F.lit(1)).cast("long").alias("b"),
            )

        return fn

    win_arrays = []
    for w in windows:
        win = F.when(
            F.size("toks") >= w,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - F.lit(w)), _window_struct(w)
            ),
        ).otherwise(F.array().cast(
            "array<struct<wg:int,mention:string,normed:array<string>,a:bigint,b:bigint>>"
        ))
        win_arrays.append(win)

    df = df.select(
        "url", *extra_cols, "itext", "ichunk", "sent_off",
        F.explode(F.flatten(F.array(*win_arrays))).alias("m"),
    )

    return (
        df.where(window_is_valid_col(F.col("m.normed")))
        .select(
            "url",
            *extra_cols,
            "itext",
            "ichunk",
            F.col("m.wg").alias("wg"),
            F.col("m.mention").alias("mention"),
            blocking_key_col(F.col("m.normed")).alias("key"),
            F.col("m.a").alias("a"),
            F.col("m.b").alias("b"),
            (F.col("sent_off") + F.col("m.a")).cast("long").alias("a_abs"),
            (F.col("sent_off") + F.col("m.b")).cast("long").alias("b_abs"),
        )
    )


def generate_mentions_fast(
    pages: DataFrame, windows: tuple[int, ...] = (1, 2, 3), lang: str | None = "en"
) -> DataFrame:
    """Same semantics as generate_mentions, different physical plan: nested
    higher-order-function lambdas are *interpreted* in Spark (not
    whole-stage-codegen'd), so the per-window transform/slice/struct
    expressions dominate at scale. This variant explodes tokens to rows
    (GenerateExec + scalar expressions — fully codegen'd) and forms W2/W3
    windows with lead() over (url, ichunk, pos): one shuffle on (url,
    ichunk), everything else tight columnar code. ~5-10x faster per doc.
    """
    assert tuple(windows) == (1, 2, 3), "fast path is specialized to W1/W2/W3"
    df = pages
    if lang is not None and "lang" in df.columns:
        df = df.where(F.col("lang") == lang)

    df = df.select(
        "url",
        F.lit(0).cast("long").alias("itext"),
        split_sentences(normalize_ws(F.col("text"))).alias("sents"),
    )
    df = df.select(
        "url",
        "itext",
        F.posexplode(
            F.arrays_zip(
                F.col("sents"),
                F.slice(_starts(F.col("sents")), 1, F.size("sents")).alias("soff"),
            )
        ).alias("ichunk", "z"),
    ).select(
        "url",
        "itext",
        F.col("ichunk").cast("long").alias("ichunk"),
        F.col("z.sents").alias("sent"),
        F.col("z.soff").alias("sent_off"),
    )
    toks = tokenize_col(F.col("sent"))
    df = df.select(
        "url", "itext", "ichunk", "sent_off",
        F.posexplode(
            F.arrays_zip(
                toks.alias("tok"),
                F.slice(_starts(toks), 1, F.size(toks)).alias("tstart"),
            )
        ).alias("pos", "t"),
    ).select(
        "url", "itext", "ichunk", "sent_off", "pos",
        F.col("t.tok").alias("tok"),
        F.col("t.tstart").alias("tstart"),
    )
    df = df.withColumn("normed", norm_token_col(F.col("tok"))).withColumn(
        "tend", F.col("tstart") + F.length("tok")
    )

    from pyspark.sql import Window as W

    w = W.partitionBy("url", "itext", "ichunk").orderBy("pos")
    df = df.select(
        "url", "itext", "ichunk", "sent_off", "tstart",
        "tok", "normed", "tend",
        F.lead("tok", 1).over(w).alias("tok2"),
        F.lead("normed", 1).over(w).alias("normed2"),
        F.lead("tend", 1).over(w).alias("tend2"),
        F.lead("tok", 2).over(w).alias("tok3"),
        F.lead("normed", 2).over(w).alias("normed3"),
        F.lead("tend", 2).over(w).alias("tend3"),
    )

    stype = (
        "array<struct<wg:int,mention:string,normed:array<string>,b:bigint>>"
    )
    wstructs = F.filter(
        F.array(
            F.struct(
                F.lit(1).alias("wg"),
                F.col("tok").alias("mention"),
                F.array("normed").alias("normed"),
                F.col("tend").cast("long").alias("b"),
            ),
            F.when(
                F.col("tok2").isNotNull(),
                F.struct(
                    F.lit(2).alias("wg"),
                    F.concat_ws(" ", "tok", "tok2").alias("mention"),
                    F.array("normed", "normed2").alias("normed"),
                    F.col("tend2").cast("long").alias("b"),
                ),
            ).otherwise(F.lit(None).cast(
                "struct<wg:int,mention:string,normed:array<string>,b:bigint>"
            )),
            F.when(
                F.col("tok3").isNotNull(),
                F.struct(
                    F.lit(3).alias("wg"),
                    F.concat_ws(" ", "tok", "tok2", "tok3").alias("mention"),
                    F.array("normed", "normed2", "normed3").alias("normed"),
                    F.col("tend3").cast("long").alias("b"),
                ),
            ).otherwise(F.lit(None).cast(
                "struct<wg:int,mention:string,normed:array<string>,b:bigint>"
            )),
        ).cast(stype),
        lambda s: s.isNotNull(),
    )
    df = df.select(
        "url", "itext", "ichunk", "sent_off", "tstart",
        F.explode(wstructs).alias("m"),
    )
    return (
        df.where(window_is_valid_col(F.col("m.normed")))
        .select(
            "url",
            "itext",
            "ichunk",
            F.col("m.wg").alias("wg"),
            F.col("m.mention").alias("mention"),
            blocking_key_col(F.col("m.normed")).alias("key"),
            F.col("tstart").cast("long").alias("a"),
            F.col("m.b").alias("b"),
            (F.col("sent_off") + F.col("tstart")).cast("long").alias("a_abs"),
            (F.col("sent_off") + F.col("m.b")).cast("long").alias("b_abs"),
        )
    )


def kb_blocking_keys(kb: DataFrame) -> DataFrame:
    """KB (entity_id, label, ...) → (entity_id, label, wg, key).
    Uses the same textnorm rules as the mention side (single source of
    truth — SURVEY.md §7.3.5)."""
    from .textnorm import norm_tokens_col

    normed = norm_tokens_col(F.col("label"))
    return kb.select(
        "entity_id",
        "label",
        F.size(normed).alias("wg"),
        blocking_key_col(normed).alias("key"),
    ).where(F.col("wg").between(1, MAX_WINDOW))
