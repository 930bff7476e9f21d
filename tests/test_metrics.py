"""pairwise_prf vs brute-force pair enumeration."""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from pelinker_spark.metrics import pairwise_prf


def _brute(rows, restrict_block):
    tp = fp = fn = 0
    for (i, a), (j, b) in combinations(enumerate(rows), 2):
        if restrict_block and a["key"] != b["key"]:
            continue
        same_pred = a["cluster_id"] == b["cluster_id"]
        same_gold = a["entity_id"] == b["entity_id"]
        if same_pred and same_gold:
            tp += 1
        elif same_pred:
            fp += 1
        elif same_gold:
            fn += 1
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def test_pairwise_prf_matches_bruteforce(spark):
    rows = [
        {"key": k, "cluster_id": c, "entity_id": e}
        for k, c, e in [
            ("a", 1, "X"), ("a", 1, "X"), ("a", 2, "X"), ("a", 2, "Y"),
            ("b", 3, "Y"), ("b", 3, "Y"), ("b", 4, "Z"),
            ("c", 5, "Z"), ("c", 5, "Z"), ("c", 5, "W"),
        ]
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    for block in (None, "key"):
        got = pairwise_prf(df, "cluster_id", "entity_id", block_col=block)
        p, r, f1 = _brute(rows, block is not None)
        assert abs(got["precision"] - p) < 1e-12
        assert abs(got["recall"] - r) < 1e-12
        assert abs(got["f1"] - f1) < 1e-12
