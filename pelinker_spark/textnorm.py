"""Text normalization and blocking-key construction.

This is the single source of truth for surface-form normalization — used by
the pipeline, the synthetic-data generator, and the evaluation join alike
(the reference duplicated this logic between util.py:913-920 and
onto.py:146-156; SURVEY.md §7.3.5 flags that as the cautionary tale, so here
the rules live in exactly one module with two *provably identical*
realizations: a pure-Python one for generators/tests and a Spark Column
expression for the distributed pipeline).

Normalization rules (deterministic, locale-free — no spaCy, no version
drift; analog of the reference's lemma keys `pelinker/onto.py:146-156`):

1. casefold via ASCII lower()
2. strip leading/trailing non-alphanumeric characters
3. de-pluralize: drop a single trailing "s" when len > 3 and the token does
   not end in "ss"

A *blocking key* for a token window is the space-join of its normalized
tokens; its *word grouping* (wg) is the window width (reference
`pelinker/onto.py:12-16` W1/W2/W3).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed stopword set — windows that are ALL stopwords are dropped
# (reference keep-predicate `pelinker/util.py:268-282`).
STOPWORDS = frozenset(
    "a an and are as at be by for from has have in is it of on or the to was with".split()
)

NEGATIVE_LABEL = "__NEGATIVE__"  # reference `pelinker/onto.py:24`

_WS_RE = re.compile(r"\s+")
_EDGE_RE = re.compile(r"^[^a-z0-9]+|[^a-z0-9]+$")


# ---------------------------------------------------------------- Python side
def norm_token(tok: str) -> str:
    """Normalize one token. Pure; mirrored exactly by norm_token_col()."""
    t = tok.lower()
    t = _EDGE_RE.sub("", t)
    if len(t) > 3 and t.endswith("s") and not t.endswith("ss"):
        t = t[:-1]
    return t


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization (raw tokens, not yet normalized)."""
    return [t for t in _WS_RE.split(text) if t]


def blocking_key(tokens: list[str]) -> str | None:
    """Space-joined normalized tokens; None if any token normalizes empty
    or the window is all stopwords."""
    normed = [norm_token(t) for t in tokens]
    if any(not n for n in normed):
        return None
    if all(n in STOPWORDS for n in normed):
        return None
    return " ".join(normed)


# ----------------------------------------------------------------- Spark side
_ALNUM = "abcdefghijklmnopqrstuvwxyz0123456789"


def norm_token_col(tok: Column) -> Column:
    """Spark Column mirror of norm_token(). Pure column algebra —
    whole-stage-codegen'd, no Python.

    The edge-strip regex is translate-gated: java.util.regex costs ~25us
    per evaluation and this column runs per token per window (~100M evals
    per 320k pages); checking the first+last char with translate (a
    char-map walk) skips the regex for the overwhelmingly common clean
    token."""
    low = F.lower(tok)
    edge = F.concat(F.substring(low, 1, 1), F.substring(low, -1, 1))
    needs = F.length(F.translate(edge, _ALNUM, "")) > 0
    t = F.when(
        needs, F.regexp_replace(low, r"^[^a-z0-9]+|[^a-z0-9]+$", "")
    ).otherwise(low)
    return F.when(
        (F.length(t) > 3) & t.endswith("s") & ~t.endswith("ss"),
        t.substr(F.lit(1), F.length(t) - 1),
    ).otherwise(t)


def tokenize_col(text: Column) -> Column:
    """array<string> of raw whitespace tokens (empties removed)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def norm_tokens_col(text: Column) -> Column:
    """array<string> of normalized tokens."""
    return F.transform(tokenize_col(text), norm_token_col)


_SQL_STOPWORDS = ",".join(f"'{w}'" for w in sorted(STOPWORDS))


def window_is_valid_col(normed: Column) -> Column:
    """Keep-predicate on an array of normalized window tokens: no empty
    token, not all-stopword (reference `pelinker/util.py:268-282`)."""
    no_empty = ~F.exists(normed, lambda t: t == "")
    not_all_stop = F.exists(
        normed, lambda t: ~t.isin(*sorted(STOPWORDS))
    )
    return no_empty & not_all_stop


def blocking_key_col(normed: Column) -> Column:
    """Space-join an array of normalized tokens into the blocking key."""
    return F.array_join(normed, " ")
