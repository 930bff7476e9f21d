"""Deterministic synthetic Common-Crawl-style web-page table.

Shape per BASELINE.json `input_hint`:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Every row is a pure function of (seed, row_index) — no RNG state, no driver
loops — so the table is generated *distributed* via spark.range(n) +
mapInPandas and is byte-identical at any partitioning / parallelism level.
This is what lets the local[8]-vs-local[32] scaling bench run on literally
identical input.

Each page plants mentions of KB entities (with surface variations that the
textnorm rules map back: case changes, plural "s", extra whitespace) among
distractor tokens. The generator side-outputs nothing; gold labels are
re-derivable because planting is deterministic — `gold_mentions(spark, ...)`
recomputes the exact (url, mention span, entity_id) rows.

Reference analog: the pmid→abstract fixture corpus
(/root/reference/data/test/mag_sample.tsv, reader pelinker/ops.py:23-44);
the KB table mirrors /root/reference/data/derived/properties.synthesis.2.csv
(entity_id,label,description,example; load contract cli/fit.py:316-340).
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ------------------------------------------------------------------ KB build

_VERBS = [
    "activate", "inhibit", "regulate", "bind", "phosphorylate", "cleave",
    "transport", "encode", "repress", "stabilize", "degrade", "methylate",
    "acetylate", "localize", "dimerize", "export", "import", "fold",
    "oxidize", "reduce",
]
_MODS = ["strongly", "weakly", "directly", "partially", "rapidly", "slowly"]
_OBJS = ["receptor", "kinase", "promoter", "channel", "ligand", "domain"]

_DISTRACTORS = (
    "cell protein gene pathway tissue sample assay control group model "
    "result method figure table data level rate value signal marker factor "
    "region site sequence variant type form case study patient subject dose "
    "the a an and of in to for with on at by from was were has have is are"
).split()

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]


def _h(*parts: object) -> int:
    """Stable 64-bit hash of the parts — the only randomness source."""
    s = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


# page_record calls _h once per token (~150 md5s/page); the join+str
# formatting around the hash dominated the generator's CPU (round 6).
# These helpers produce byte-identical hash inputs with the per-sentence
# prefix built once and small ints pre-encoded.
_BINT = tuple(str(x).encode() for x in range(64))


def kb_rows(n_entities: int, seed: int = 13) -> list[dict]:
    """Deterministic KB: entity_id, label (1-3 words), description, example.

    Labels are constructed pairwise-distinct *after normalization* so that a
    blocking key maps to exactly one entity (the generator's gold contract).
    """
    rows = []
    seen = set()
    i = 0
    while len(rows) < n_entities:
        h = _h(seed, "kb", i)
        nw = 1 + (h % 3)  # 1..3 words
        verb = _VERBS[(h >> 8) % len(_VERBS)]
        words = [verb]
        if nw >= 2:
            words.insert(0, _MODS[(h >> 16) % len(_MODS)])
        if nw >= 3:
            words.append(_OBJS[(h >> 24) % len(_OBJS)])
        label = " ".join(words)
        key = label.lower()
        i += 1
        if key in seen:
            continue
        seen.add(key)
        eid = f"PEL.{len(rows):06d}"
        desc = None if h % 7 == 0 else f"relation where subject {label} object"
        if h % 11 == 0 and desc is not None:
            desc = desc + " (inverse)"
        rows.append(
            {
                "entity_id": eid,
                "label": label,
                "description": desc,
                "example": f"A {label} B" if h % 5 else None,
            }
        )
    return rows


def kb_table(spark: SparkSession, n_entities: int = 50, seed: int = 13) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("entity_id", T.StringType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("description", T.StringType(), True),
            T.StructField("example", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(kb_rows(n_entities, seed)), schema)


# --------------------------------------------------------------- page build

def _vary_surface(label: str, h: int) -> str:
    """Surface variation. v∈{0..3}: textnorm maps back to the same blocking
    key (case / plural). v∈{4,5}: an OCR-style hyphen typo inside the last
    word — the blocking key CHANGES, so linking these back to the canonical
    cluster requires the fuzzy channel (MinHash-LSH candidates + JW/cosine
    scoring + transitive CC), not just exact key grouping."""
    v = h % 6
    if v == 0:
        return label
    if v == 1:
        return label.capitalize()
    if v == 2:  # pluralize last word (normalizer strips the trailing s)
        ws = label.split(" ")
        last = ws[-1]
        if not last.endswith("s"):
            ws[-1] = last + "s"
        return " ".join(ws)
    if v == 3:
        return label.upper()
    # hyphen typo: "activate" -> "acti-vate" (deterministic split point)
    ws = label.split(" ")
    last = ws[-1]
    if len(last) >= 6:
        cut = 3 + (h >> 8) % (len(last) - 4)
        ws[-1] = last[:cut] + "-" + last[cut:]
        return " ".join(ws)
    return label


def page_record(seed: int, i: int, kb: list[dict]) -> dict:
    """Pure (seed, i) → page row. Plants 1-4 entity mentions."""
    h = _h(seed, "page", i)
    lang = _LANGS[h % len(_LANGS)]
    n_sent = 3 + (h >> 4) % 5
    n_mentions = 1 + (h >> 8) % 4
    sents: list[str] = []
    md5 = hashlib.md5
    n_dis = len(_DISTRACTORS)
    for s in range(n_sent):
        hs = _h(seed, "sent", i, s)
        n_tok = 6 + hs % 9
        # identical bytes to _h(seed, "tok", i, s, t), with the constant
        # prefix encoded once per sentence instead of re-joined per token
        pre = f"{seed}\x1ftok\x1f{i}\x1f{s}\x1f".encode()
        toks = []
        append = toks.append
        for t in range(n_tok):
            ht = int.from_bytes(md5(pre + _BINT[t]).digest()[:8], "big")
            # Zipf-ish: 60% head vocabulary, 40% long-tail hashed terms —
            # realistic webtext has a heavy tail; a tiny closed vocabulary
            # would make every n-gram window collide with every other
            if ht % 5 < 3:
                append(_DISTRACTORS[ht % n_dis])
            else:
                append(f"term{(ht >> 16) % 20000}")
        if s < n_mentions:
            ent = kb[_h(seed, "ment", i, s) % len(kb)]
            surface = _vary_surface(ent["label"], _h(seed, "var", i, s))
            pos = 1 + _h(seed, "pos", i, s) % (n_tok - 1)
            toks = toks[:pos] + [surface] + toks[pos:]
        sents.append(" ".join(toks) + ".")
    text = " ".join(sents)
    host = f"host-{h % 97}"
    url = f"https://{host}.example/p/{i}"
    ts = datetime.fromtimestamp(1_500_000_000 + (h % 200_000_000), tz=timezone.utc)
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": render_html(url, text),
        "text": text,
        "lang": lang,
    }


def render_html(url: str, text: str) -> bytes:
    """Deterministic HTML rendering of a page; extract_text() inverts it
    byte-for-byte (the per-row invariant from BASELINE.json input_hint)."""
    body = _htmlmod.escape(text, quote=False)
    doc = (
        "<!DOCTYPE html><html><head>"
        f'<meta charset="utf-8"><link rel="canonical" href="{_htmlmod.escape(url)}">'
        "<title>synthetic page</title></head><body>"
        f"<article><p>{body}</p></article>"
        "</body></html>"
    )
    return doc.encode("utf-8")


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def web_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_entities: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas, no driver loop.
    Identical bytes at any parallelism because rows depend only on (seed, id).
    """
    kb = kb_rows(n_entities, seed=13)
    rng = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            recs = [page_record(seed, int(i), kb) for i in pdf["id"]]
            # dict-of-lists constructor: pandas builds each column once
            # instead of inferring/aligning per row dict (round 6)
            yield pd.DataFrame(
                {k: [r[k] for r in recs] for k in
                 ("url", "warc_ts", "html", "text", "lang")}
            )

    return rng.mapInPandas(gen, PAGE_SCHEMA)


def gold_mentions(spark: SparkSession, n_pages: int, seed: int = 42,
                  n_entities: int = 50) -> DataFrame:
    """Recompute the planted gold labels: (url, sent_idx, entity_id, surface,
    gold_key). gold_key is the normalized blocking key — evaluation happens
    'at the same blocking key' per the north rule."""
    from .textnorm import blocking_key, tokenize

    kb = kb_rows(n_entities, seed=13)
    rng = spark.range(0, n_pages, 1, spark.sparkContext.defaultParallelism)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("sent_idx", T.LongType(), False),
            T.StructField("entity_id", T.StringType(), False),
            T.StructField("surface", T.StringType(), False),
            T.StructField("gold_key", T.StringType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = _h(seed, "page", i)
                n_mentions = 1 + (h >> 8) % 4
                n_sent = 3 + (h >> 4) % 5
                url = f"https://host-{h % 97}.example/p/{i}"
                for s in range(min(n_mentions, n_sent)):
                    ent = kb[_h(seed, "ment", i, s) % len(kb)]
                    surface = _vary_surface(ent["label"], _h(seed, "var", i, s))
                    rows.append(
                        {
                            "url": url,
                            "sent_idx": s,
                            "entity_id": ent["entity_id"],
                            "surface": surface,
                            "gold_key": blocking_key(tokenize(surface)),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return rng.mapInPandas(gen, schema)
