"""Cluster-quality metrics: pairwise precision/recall/F1 via contingency
counting — never materializes pairs (at 10^12 mentions the within-cluster
pair count is quadratic; the counts below are linear in distinct
(cluster, entity) cells).

Maps the reference's ARI/cluster-fit metrics (pelinker/analysis.py:162-185,
:756-796) to the driver's metric: pairwise F1 vs gold labels *evaluated at
the same blocking key* (BASELINE.json north_rule) — i.e. the pair universe
is restricted to mention pairs sharing a blocking key, which is exactly a
per-key contingency sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    return (col * (col - F.lit(1)) / F.lit(2)).cast("double")


def pairwise_prf(
    labeled: DataFrame,
    pred_col: str = "cluster_id",
    gold_col: str = "entity_id",
    block_col: str | None = "key",
) -> dict[str, float]:
    """labeled: one row per item with predicted cluster + gold label (+
    optional blocking key). Returns precision/recall/f1 plus raw pair
    counts. If block_col is given, only pairs sharing that key count
    (the north-rule evaluation regime); pass None for global pairwise F1.
    """
    keys = [block_col] if block_col else []
    cell = labeled.groupBy(*keys, pred_col, gold_col).agg(F.count("*").alias("n"))
    tp = cell.agg(F.sum(_c2(F.col("n")))).collect()[0][0] or 0.0
    pred_sz = (
        cell.groupBy(*keys, pred_col).agg(F.sum("n").alias("n"))
        .agg(F.sum(_c2(F.col("n"))))
        .collect()[0][0]
        or 0.0
    )
    gold_sz = (
        cell.groupBy(*keys, gold_col).agg(F.sum("n").alias("n"))
        .agg(F.sum(_c2(F.col("n"))))
        .collect()[0][0]
        or 0.0
    )
    precision = tp / pred_sz if pred_sz else 1.0
    recall = tp / gold_sz if gold_sz else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp_pairs": tp,
        "pred_pairs": pred_sz,
        "gold_pairs": gold_sz,
    }
