"""Knowledge-base table operators.

Reference: pre_process_properties (pelinker/preprocess.py:1-63) — drop
labels containing " low ", drop rows with null descriptions or
descriptions containing "inverse", deterministic entity_id ordering —
plus the fuzzy surface matcher match_pattern (pelinker/matching.py:4-23):
words longer than 5 chars are stem-truncated, joined by bounded gap
patterns, anchored at word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
