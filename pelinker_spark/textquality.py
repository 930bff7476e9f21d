"""Reusable text-analysis column functions for the LLM-data-pipeline
channels: document quality scoring and language identification.

Promoted out of the oracle queries (VERDICT r1 #8) so pipelines can compose
them; the queries in operators/relational.py call these as their bodies.
Pure column algebra — whole-stage codegen, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUALITY_STOPS = ["the", "a", "of", "and", "to", "in"]

LANG_STOPS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}


def _stop_hits(toks: Column, stops: list[str]) -> Column:
    def fn(t):  # unary — extra params would bind to the element index
        return t.isin(*stops)

    return F.size(F.filter(toks, fn)).cast("int")


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length/stopword-ratio quality heuristic over whitespace tokens:
    quality = (1 - stop_ratio) * min(n_tokens, 100) / 100 — short or
    stopword-saturated documents score low (the classic pretraining-corpus
    quality gate shape). Returns named columns: n_tokens, stop_ratio,
    quality."""
    toks = F.split(text, " ")
    n_tokens = F.size(toks).cast("int")
    stop_ratio = _stop_hits(toks, QUALITY_STOPS) * F.lit(1.0) / n_tokens
    quality = (1 - stop_ratio) * F.least(n_tokens, F.lit(100)) / F.lit(100.0)
    return {"n_tokens": n_tokens, "stop_ratio": stop_ratio, "quality": quality}


def lang_id_cols(text: Column) -> dict[str, Column]:
    """Stopword-profile language ID over {en, de, fr}: count hits per
    language's closed-class word list, predict the argmax (ties resolved
    en > de > fr). Returns hits_<lang> columns plus predicted_lang."""
    toks = F.split(text, " ")
    hits = {lg: _stop_hits(toks, stops) for lg, stops in LANG_STOPS.items()}
    pred = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]), "en")
        .when(hits["de"] >= hits["fr"], "de")
        .otherwise("fr")
    )
    out = {f"hits_{lg}": c for lg, c in hits.items()}
    out["predicted_lang"] = pred
    return out
