"""Knowledge-base table operators.

Reference: pre_process_properties (pelinker/preprocess.py:1-63) — drop
labels containing " low ", drop rows with null descriptions or
descriptions containing "inverse", deterministic entity_id ordering —
plus the fuzzy surface matcher match_pattern (pelinker/matching.py:4-23):
words longer than 5 chars are stem-truncated, joined by bounded gap
patterns, anchored at word boundaries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def preprocess_kb(kb: DataFrame) -> DataFrame:
    """P1 + O2: the reference's KB hygiene filters, as column predicates."""
    return (
        kb.where(~F.lower(F.col("label")).contains(" low "))
        .where(F.col("description").isNotNull())
        .where(~F.lower(F.col("description")).contains("inverse"))
        .orderBy("entity_id")
    )


def fuzzy_label_pattern(label: str, stem_over: int = 5, gap: str = r"\s+[\w\s-]{0,9}") -> str:
    """Build the reference's fuzzy regex for a KB label, mirroring
    match_pattern (pelinker/matching.py:4-23) exactly: every word is
    prefix-anchored with \\b and suffixed with \\w*; words longer than
    stem_over chars additionally lose their last char (suffix_length=1,
    'induces' → 'induce'); words are joined by a bounded gap; the whole
    pattern ends on a word boundary."""
    import re as _re

    pieces = []
    for w in label.split(" "):
        stem = w[:-1] if len(w) > stem_over else w
        pieces.append(r"\b" + _re.escape(stem) + r"\w*")
    return gap.join(pieces) + r"\b"


def fuzzy_match_col(text: Column, label: str) -> Column:
    """Boolean: does the fuzzy pattern for `label` occur in text?
    Pure column predicate (rlike) — usable as a broadcast-join pushdown
    or validation filter (reference linker_kb_lemma.py:42-62)."""
    return F.lower(text).rlike(fuzzy_label_pattern(label.lower()))


def fuzzy_match_extract(text: Column, label: str) -> Column:
    """First fuzzy occurrence of label in text ('' if none)."""
    return F.regexp_extract(
        F.lower(text), f"({fuzzy_label_pattern(label.lower())})", 1
    )


def override_join(
    full: DataFrame,
    fit: DataFrame,
    key: str,
    col: str,
    fit_col: str | None = None,
) -> DataFrame:
    """J6: left-join exact fit-set values over approximate full-set values
    — coalesce(fit value, full value) (reference
    _predict_cluster_labels_on_full_manifold, model.py:260-285)."""
    fit_col = fit_col or col
    f = fit.select(key, F.col(fit_col).alias("__fit"))
    return (
        full.join(f, key, "left")
        .withColumn(col, F.coalesce(F.col("__fit"), F.col(col)))
        .drop("__fit")
    )


# ------------------------------------- KB-lemma validation on predictions
def validate_kb_anchors(
    clusters: DataFrame, kb: DataFrame, fuzzy: bool = True
) -> DataFrame:
    """Post-link KB validation columns on the cluster output (reference
    enrich_entity_predictions_kb_validation + build_kb_lemma_index,
    linker_kb_lemma.py:9-62): resolve the KB entity reachable from the
    mention's own (wg, lemma-key) — the same index resolution used at
    link time — and compare it against the cluster's KB anchor.

    Adds:
      kb_label          — the anchor entity's label (null if unanchored)
      kb_lemma_entity_id— entity whose label lemma-key equals the
                          mention's key (null if none)
      kb_label_valid    — anchored AND (lemma-key match OR, with
                          fuzzy=True, the anchor label's fuzzy pattern
                          (matching.py:4-23) occurs in the mention — this
                          is what validates typo variants merged into an
                          anchored cluster)

    Plan: two broadcast joins against KB-derived dims; the fuzzy rlike
    evaluates only where an anchor label is present (non-anchored rows
    short-circuit on the null pattern), so the per-row regex touches the
    anchored minority only."""
    from .mentions import kb_blocking_keys

    # two KB entities whose labels normalize to the same (wg, lemma-key)
    # would duplicate every prediction row through the left join — resolve
    # the collision the same way the pipeline's anchor join does
    # (deterministic min entity), but keep the full id set so a cluster
    # anchored to the non-min duplicate still validates as exact
    kbk = (
        kb_blocking_keys(kb)
        .groupBy("wg", "key")
        .agg(
            F.min("entity_id").alias("kb_lemma_entity_id"),
            F.collect_set("entity_id").alias("__lemma_ids"),
        )
    )
    out = clusters.join(F.broadcast(kbk), ["wg", "key"], "left")

    labels = kb.select(
        F.col("entity_id").alias("kb_entity_id"),
        F.col("label").alias("kb_label"),
    )
    if fuzzy:

        @F.pandas_udf(T.StringType())
        def _pattern_udf(ls: pd.Series) -> pd.Series:
            return ls.map(
                lambda s: fuzzy_label_pattern(s.lower()) if s else None
            )

        # patterns are built ONCE per KB row (small dim), never per mention
        labels = labels.withColumn("__pat", _pattern_udf(F.col("kb_label")))
    out = out.join(F.broadcast(labels), "kb_entity_id", "left")

    exact = F.array_contains(F.col("__lemma_ids"), F.col("kb_entity_id"))
    valid = exact
    if fuzzy:
        valid = valid | F.regexp_like(F.lower(F.col("mention")), F.col("__pat"))
    out = out.withColumn(
        "kb_label_valid", F.coalesce(valid, F.lit(False))
    ).drop("__lemma_ids")
    return out.drop("__pat") if fuzzy else out


# ------------------------------------------------- F14: label simplicity
SIMPLICITY_STOPWORDS = ("is", "of", "the", "a", "an", "to", "for", "or", "in", "has")


def label_simplicity_py(
    label: str,
    word_frequencies: dict[str, float],
    zero_freq_penalty: float = 1e-8,
    multiword_penalty: float = 0.2,
    stopword_penalty: float = 0.3,
) -> dict:
    """Pure-Python mirror of the reference _measure_label_simplicity
    (pelinker/analysis.py:94-159): harmonic mean of content-word corpus
    frequencies, multiplicative penalties for multi-word labels and
    stopword content. Used as the parity oracle for label_simplicity()."""
    text = label.strip().lower()
    if not text:
        return {"char_count": 0, "word_count": 0, "simplicity_score": 0.0}
    words = text.split()
    word_count = len(words)
    content = [w for w in words if w not in SIMPLICITY_STOPWORDS]
    stop_count = word_count - len(content)
    if not content:
        return {
            "char_count": len(text),
            "word_count": word_count,
            "simplicity_score": zero_freq_penalty,
        }
    freqs = [word_frequencies.get(w, zero_freq_penalty) for w in content]
    hmean = len(freqs) / sum(1.0 / max(f, zero_freq_penalty) for f in freqs)
    penalty = 1.0
    if word_count > 1:
        penalty *= max(0.0, 1.0 - multiword_penalty * (word_count - 1))
    if stop_count > 0 and word_count > 1:
        penalty *= max(0.0, 1.0 - stopword_penalty * stop_count)
    return {
        "char_count": len(text),
        "word_count": word_count,
        "simplicity_score": hmean * penalty,
    }


def label_simplicity(
    kb: DataFrame,
    freq: DataFrame,
    label_col: str = "label",
    zero_freq_penalty: float = 1e-8,
    multiword_penalty: float = 0.2,
    stopword_penalty: float = 0.3,
) -> DataFrame:
    """F14 as distributed column algebra: word frequencies come from a
    TABLE `freq(word, freq)` (at corpus scale frequencies are themselves
    an aggregation output, not a driver literal) joined broadcast onto the
    exploded label words; the harmonic mean and penalties are one groupBy
    back onto the label row. Adds char_count, word_count,
    simplicity_score to the kb frame."""
    # Score each DISTINCT label once: duplicate labels (two entities
    # sharing a label) would otherwise multiply the per-word counts per
    # duplicate and inflate the multiword/stopword penalties (ADVICE r2).
    base = (
        kb.select(label_col)
        .dropDuplicates([label_col])
        .withColumn("__text", F.lower(F.trim(F.col(label_col))))
    )
    words = base.select(
        label_col,
        "__text",
        F.posexplode(
            F.filter(F.split(F.col("__text"), r"\s+"), lambda w: w != "")
        ).alias("__pos", "__w"),
    )
    is_stop = F.col("__w").isin(*SIMPLICITY_STOPWORDS)
    joined = words.join(
        F.broadcast(freq.select(F.col("word").alias("__w"), "freq")),
        "__w",
        "left",
    )
    eff = F.greatest(
        F.coalesce(F.col("freq"), F.lit(zero_freq_penalty)),
        F.lit(zero_freq_penalty),
    )
    per_label = joined.groupBy(label_col, "__text").agg(
        F.count("*").alias("word_count"),
        F.sum(F.when(is_stop, 1).otherwise(0)).alias("stop_count"),
        F.sum(F.when(~is_stop, 1.0 / eff)).alias("inv_sum"),
        F.sum(F.when(~is_stop, 1).otherwise(0)).alias("content_count"),
    )
    penalty = F.when(
        F.col("word_count") > 1,
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.lit(multiword_penalty) * (F.col("word_count") - 1),
        )
        * F.when(
            F.col("stop_count") > 0,
            F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.lit(stopword_penalty) * F.col("stop_count"),
            ),
        ).otherwise(F.lit(1.0)),
    ).otherwise(F.lit(1.0))
    score = F.when(
        F.col("content_count") == 0, F.lit(zero_freq_penalty)
    ).otherwise(F.col("content_count") / F.col("inv_sum") * penalty)
    scored = per_label.select(
        label_col,
        F.length("__text").alias("char_count"),
        "word_count",
        score.alias("simplicity_score"),
    )
    # empty/whitespace labels never reach the explode — re-attach as zeros
    return kb.join(scored, label_col, "left").select(
        *kb.columns,
        F.coalesce(F.col("char_count"), F.lit(0)).alias("char_count"),
        F.coalesce(F.col("word_count"), F.lit(0)).alias("word_count"),
        F.coalesce(F.col("simplicity_score"), F.lit(0.0)).alias(
            "simplicity_score"
        ),
    )
