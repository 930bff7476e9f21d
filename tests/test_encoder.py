"""Numpy transformer encoder (M1/M2 production body): determinism,
padding-mask correctness, similarity structure, variant independence,
UDF integration, and the full link pipeline running on it."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark import encoder as E
from pelinker_spark.encoder import encode_batch_transformer


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b))


def test_deterministic_across_fresh_weights():
    """Same text -> bit-identical vector even after the per-process weight
    and trigram caches are dropped (a new executor must agree with an old
    one, or distinct-key encode joins would mis-match)."""
    v1 = encode_batch_transformer(pd.Series(["acetylcholine receptor"]))[0]
    E._MODELS.clear()
    E._GRAM_IDS.clear()
    v2 = encode_batch_transformer(pd.Series(["acetylcholine receptor"]))[0]
    assert v1.dtype == np.float32
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5


def test_batch_composition_invariance():
    """The padding mask must make each row independent of what it was
    batched with — solo encode == encode among long strangers. This is
    the test that catches a broken attention mask or unmasked pool."""
    texts = [
        "harvard university",
        "x" * 200,  # truncated at MAX_LEN — also covers the clamp
        "a",
        "some very long other string about proteins and receptors",
    ]
    batched = encode_batch_transformer(pd.Series(texts))
    for i, t in enumerate(texts):
        solo = encode_batch_transformer(pd.Series([t]))[0]
        assert float(np.abs(solo - batched[i]).max()) < 1e-5, t


def test_similarity_structure():
    """Typo'd surfaces stay close (shared trigram sequences attend over
    mostly-identical embeddings); unrelated surfaces land far apart —
    the property the linkage cosine threshold relies on."""
    typo_pairs = [
        ("harvard university", "harvard universiy"),
        ("acetylcholine receptor", "acetylcholine reeceptor"),
        ("new york city", "new york cty"),
    ]
    unrelated = [
        ("harvard university", "mitochondrial membrane"),
        ("alpha synuclein", "yellowstone park"),
    ]
    texts = sorted({t for p in typo_pairs + unrelated for t in p})
    vecs = dict(zip(texts, encode_batch_transformer(pd.Series(texts))))
    for a, b in typo_pairs:
        assert _cos(vecs[a], vecs[b]) > 0.7, (a, b)
    for a, b in unrelated:
        assert _cos(vecs[a], vecs[b]) < 0.5, (a, b)
    same = encode_batch_transformer(pd.Series(["alpha synuclein"] * 2))
    assert np.array_equal(same[0], same[1])


def test_variant_independence():
    """'transformer' and 'transformer:<name>' draw independent weights —
    distinct embedding sources for fusion (J2/J3), like the reference's
    (model, layer) axis."""
    a = encode_batch_transformer(pd.Series(["harvard university"]))[0]
    b = encode_batch_transformer(
        pd.Series(["harvard university"]), salt="alt"
    )[0]
    assert abs(_cos(a, b)) < 0.5


def test_udf_matches_local_body(spark):
    from pelinker_spark.scoring import make_encode_udf

    texts = ["harvard university", "new york cty", "", "é字 unicode"]
    df = spark.createDataFrame(pd.DataFrame({"key": texts}))
    rows = (
        df.withColumn("emb", make_encode_udf("transformer")(F.col("key")))
        .orderBy("key")
        .collect()
    )
    local = dict(
        zip(texts, (np.asarray(v) for v in encode_batch_transformer(pd.Series(texts))))
    )
    for r in rows:
        got = np.asarray(r["emb"], np.float32)
        assert float(np.abs(got - local[r["key"]]).max()) < 1e-6, r["key"]


def test_pipeline_end_to_end_on_transformer(spark):
    """The whole link pipeline with the transformer as the embedding
    source: planted typo corpus resolves at F1 >= 0.99 — M1/M2's body is
    a working production path, not a display piece."""
    from pelinker_spark.pipeline import (
        LinkConfig,
        evaluate_against_gold,
        link_pipeline,
    )
    from pelinker_spark.synth import gold_mentions, kb_table, web_pages

    n_pages, n_entities = 400, 30
    pages = web_pages(spark, n_pages, seed=7, n_entities=n_entities, partitions=8)
    kb = kb_table(spark, n_entities)
    gold = gold_mentions(spark, n_pages, seed=7, n_entities=n_entities)
    gold = gold.join(pages.where(F.col("lang") == "en").select("url"), "url")

    cfg = LinkConfig(encoder_variants=("transformer",), cos_threshold=0.7)
    res = link_pipeline(spark, pages, kb=kb, cfg=cfg)
    m = evaluate_against_gold(res.clusters, gold)
    assert m["f1"] >= 0.99, m
