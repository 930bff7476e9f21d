"""Text chunking with the byte-identity round-trip contract.

The reference's chunkers guarantee concat(chunks) == original text exactly
(char-budget split util.py:505-525; token-budget split with binary search
util.py:528-585; invariant asserted in test_chunking_layers.py:36-52).
Both re-expressed here as pure column algebra producing Array<String>
chunk columns — `posexplode` turns them into chunk rows with indices
(the ichunk dimension of the mention table).

Token counting uses (a) whitespace tokens and (b) a BPE-ish regex
(letter runs / digit runs / single other-symbols) — the tokenizer-agnostic
budget proxy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_ISH = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_ish_tokens(text: Column) -> Column:
    """array<string> of BPE-ish tokens (regexp_extract_all)."""
    return F.regexp_extract_all(text, F.lit(f"({BPE_ISH})"), 1)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def split_char_budget(text: Column, max_chars: int) -> Column:
    """array<string> chunks, each <= max_chars, concat == original
    byte-for-byte. Prefers to break after the last space inside the
    budget (reference split_text_into_batches, util.py:505-525); falls
    back to a hard cut when a budget window has no space.

    Implemented as an aggregate over chunk-count candidates: state is
    (remaining, chunks); each step cuts one chunk off the front.

    Step budget: the adversarial minimum consumption is max_chars+1 chars
    per 2 steps (a 1-char space-cut followed by a spaceless hard cut of
    max_chars — e.g. "a " + a long URL/base64 run), so
    ceil(2*len/(max_chars+1)) steps always reach the end; +2 for slack.
    The finish lambda additionally appends any non-empty rest so the
    concat(chunks) == text byte-identity contract can never be violated
    by an undersized budget.
    """
    n_steps = F.ceil(F.length(text) * 2 / (max_chars + 1)) + F.lit(2)
    init = F.struct(
        text.alias("rest"), F.array().cast("array<string>").alias("chunks")
    )

    def step(acc, _):
        rest = acc["rest"]
        head = F.substring(rest, 1, max_chars)
        # cut at last space within budget if the rest overflows
        last_space = F.length(
            F.regexp_extract(head, r"^(.*[ ])[^ ]*$", 1)
        )
        cut = F.when(F.length(rest) <= max_chars, F.length(rest)).otherwise(
            F.when(last_space > 0, last_space).otherwise(F.lit(max_chars))
        )
        piece = F.substring(rest, 1, cut)
        new_rest = F.substr(rest, cut + 1, F.length(rest))
        return F.struct(
            F.when(F.length(rest) > 0, new_rest).otherwise(rest).alias("rest"),
            F.when(F.length(rest) > 0, F.concat(acc["chunks"], F.array(piece)))
            .otherwise(acc["chunks"])
            .alias("chunks"),
        )

    agg = F.aggregate(
        F.sequence(F.lit(1), n_steps.cast("int")),
        init,
        step,
        # safety net: leftover text is appended, never dropped (byte
        # identity beats the per-chunk budget if the two ever conflict)
        lambda acc: F.when(
            F.length(acc["rest"]) > 0, F.concat(acc["chunks"], F.array(acc["rest"]))
        ).otherwise(acc["chunks"]),
    )
    return agg


def split_token_budget(text: Column, max_tokens: int) -> Column:
    """array<string> chunks of <= max_tokens whitespace tokens each,
    concat == original byte-for-byte (the reference's exact-coverage
    contract, util.py:528-585). Splitting on token boundaries keeps the
    separator with the preceding chunk via split-with-lookahead."""
    # tokens-with-separators: split BEFORE each run of non-space following
    # a space boundary, so every piece re-concatenates exactly
    pieces = F.split(text, r"(?=(?<=\s)\S)")
    n = F.size(pieces)
    idxs = F.sequence(F.lit(0), F.ceil(n / max_tokens).cast("int") - F.lit(1))
    return F.when(F.length(text) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idxs,
            lambda i: F.array_join(
                F.slice(pieces, i * max_tokens + 1, max_tokens), ""
            ),
        )
    )
