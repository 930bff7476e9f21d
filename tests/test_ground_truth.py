"""GT JSON loader + end-to-end span accuracy on a labeled document
(reference README.md:33-39 testing-against-ground-truth flow)."""

from __future__ import annotations

import json

from pelinker_spark.ground_truth import load_ground_truth_json
from pelinker_spark.mentions import generate_mentions
from pelinker_spark.metrics import span_accuracy


def test_gt_loader_and_span_accuracy(spark, tmp_path):
    text = (
        "Alpha kinase activates the beta receptor. "
        "The gamma channel blocks alpha kinase strongly. "
        "Unrelated filler sentence ends here."
    )
    gt = {
        "text": text,
        "ground_truth": [
            {"itext": 0, "a": 0, "b": 12, "entity_id": "E.001"},   # "Alpha kinase"
            {"itext": 0, "a": 27, "b": 40, "entity_id": "E.002"},  # "beta receptor"
            {"itext": 0, "a": 46, "b": 59, "entity_id": "E.003"},  # "gamma channel"
            {"itext": 0, "a": 67, "b": 79, "entity_id": "E.001"},  # "alpha kinase"
        ],
    }
    p = tmp_path / "sample.0.gt.json"
    p.write_text(json.dumps(gt))

    pages, gold = load_ground_truth_json(spark, [str(p)])
    g = gold.toPandas().sort_values("a")
    assert list(g.surface) == [
        "Alpha kinase", "beta receptor", "gamma channel", "alpha kinase",
    ]
    assert g.gold_key.iloc[0] == "alpha kinase"  # textnorm blocking key

    mentions = generate_mentions(pages, (1, 2, 3), "en")
    acc = span_accuracy(mentions, pages, gold)
    assert acc["n_gold"] == 4  # case-distinct surfaces stay separate rows
    assert acc["accuracy"] == 1.0, acc
