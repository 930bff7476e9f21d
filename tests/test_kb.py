from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark.kb import (
    fuzzy_match_col,
    fuzzy_match_extract,
    override_join,
    preprocess_kb,
)
from pelinker_spark.synth import kb_table


def test_preprocess_kb(spark):
    kb = kb_table(spark, 60)
    out = preprocess_kb(kb)
    n_in, n_out = kb.count(), out.count()
    assert 0 < n_out < n_in  # nulls and "(inverse)" rows dropped
    rows = out.collect()
    assert all(r["description"] is not None for r in rows)
    assert all("inverse" not in r["description"].lower() for r in rows)
    ids = [r["entity_id"] for r in rows]
    assert ids == sorted(ids)


def test_fuzzy_match(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the protein strongly activates the receptor complex",
                    "activation of some unrelated receptors",
                    "nothing relevant here at all",
                ]
            }
        )
    )
    hit = df.select(
        fuzzy_match_col(F.col("text"), "strongly activate").alias("m"),
        fuzzy_match_extract(F.col("text"), "activates receptor").alias("e"),
    ).collect()
    assert hit[0]["m"] is True  # "strongly activates" matches stem+gap
    assert "activates the receptor" in hit[0]["e"]  # gap bridges "the"
    assert hit[2]["m"] is False and hit[2]["e"] == ""


def test_validate_kb_anchors(spark):
    """Reference enrich_entity_predictions_kb_validation semantics: exact
    lemma-key members validate, fuzzy typo variants of the anchor label
    validate, inconsistent anchors and unanchored rows do not."""
    from pelinker_spark.kb import validate_kb_anchors

    kb = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["E1", "E2"],
        "label": ["activates", "strongly activates"],
    }))
    clusters = spark.createDataFrame(pd.DataFrame({
        "mention": ["activates", "strongly activated",
                    "binds", "activates"],
        "key": ["activate", "strongly activ",  # 2nd: planted typo key
                "bind", "activate"],
        "wg": [1, 2, 1, 1],
        "kb_entity_id": ["E1", "E2", "E1", None],
    }))
    out = {
        (r["mention"], r["kb_entity_id"]): r
        for r in validate_kb_anchors(clusters, kb).collect()
    }
    # exact lemma-key member of its anchor entity
    r = out[("activates", "E1")]
    assert r["kb_label_valid"] and r["kb_lemma_entity_id"] == "E1"
    assert r["kb_label"] == "activates"
    # typo variant: lemma key misses, the fuzzy stem+gap pattern validates
    r = out[("strongly activated", "E2")]
    assert r["kb_lemma_entity_id"] is None
    assert r["kb_label_valid"]
    # anchored but inconsistent surface
    assert not out[("binds", "E1")]["kb_label_valid"]
    # unanchored row: never valid, no label
    r = out[("activates", None)]
    assert not r["kb_label_valid"] and r["kb_label"] is None
    # fuzzy=False keeps only the exact lemma channel
    strict = {
        (r["mention"], r["kb_entity_id"]): r["kb_label_valid"]
        for r in validate_kb_anchors(clusters, kb, fuzzy=False).collect()
    }
    assert strict[("activates", "E1")]
    assert not strict[("strongly activated", "E2")]


def test_validate_kb_anchors_duplicate_lemma_keys(spark):
    """Two KB entities whose labels normalize to the SAME lemma key
    ("activates"/"activate" → "activate") must not duplicate prediction
    rows through the validation join, and a cluster anchored to EITHER
    colliding entity validates as exact — not just the min-id one."""
    from pelinker_spark.kb import validate_kb_anchors

    kb = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["E1", "E3"],
        "label": ["activates", "activate"],
    }))
    clusters = spark.createDataFrame(pd.DataFrame({
        "mention": ["activates", "activate"],
        "key": ["activate", "activate"],
        "wg": [1, 1],
        "kb_entity_id": ["E3", "E1"],  # anchored to EITHER duplicate
    }))
    rows = validate_kb_anchors(clusters, kb, fuzzy=False).collect()
    assert len(rows) == 2  # no row duplication from the colliding kbk dim
    by_anchor = {r["kb_entity_id"]: r for r in rows}
    assert by_anchor["E3"]["kb_label_valid"]  # anchor is the non-min dup
    assert by_anchor["E1"]["kb_label_valid"]
    # the reported lemma entity resolves deterministically to the min id
    assert by_anchor["E3"]["kb_lemma_entity_id"] == "E1"


def test_override_join(spark):
    full = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "lbl": ["a", "b", "c"]})
    )
    fit = spark.createDataFrame(pd.DataFrame({"id": [2], "lbl": ["B"]}))
    out = {r["id"]: r["lbl"] for r in override_join(full, fit, "id", "lbl").collect()}
    assert out == {1: "a", 2: "B", 3: "c"}
