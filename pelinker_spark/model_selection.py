"""Model-selection lifecycle: a checkpointed grid over link configurations
with per-draw evaluation, pooled scoring, threshold plateau solving, and
fusion-candidate ranking (SURVEY.md §3.3).

Reference mapping (pelinker/model_selection/runner.py:99-1093):
  - work units keyed by (config, draw) fingerprints, skipped on resume
    (model_selection_checkpoint.py:122-183) → one parquet dir per unit
    with Spark's _SUCCESS commit as the atomicity token;
  - per-draw evaluation (bootstrap-style subsamples → cluster → score)
    → deterministic xxhash64 document draws, link_pipeline, pairwise F1
    vs gold (the north-rule metric) + the threshold metric grid;
  - cross-draw pooling + leaderboard (analysis.py:600-618, :628-722)
    → gridsearch.pool_cv_folds + pick_winner_by_pooled_metric;
  - min_cluster_size plateau solve (clustering_grid.py:240-364)
    → gridsearch.solve_optimal_grid_point over the edge-score threshold;
  - fusion-candidate ranking (clustering_fusion_ranking.py:25-66)
    → gridsearch.top_k_fusion_candidates over pooled singleton scores.

The driver orchestrates (the grid is small); every evaluation underneath
is a distributed Spark job, so the same loop runs unchanged against a
1000-executor cluster — the unit of work is a full link run, not a row.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import input_identity, run_fingerprint
from .gridsearch import (
    aggregate_grid_metrics,
    evaluate_threshold_grid,
    pick_winner_by_pooled_metric,
    pool_cv_folds,
    solve_optimal_grid_point,
    top_k_fusion_candidates,
)
from .pipeline import LinkConfig, evaluate_against_gold, link_pipeline

UNIT_SCHEMA = (
    "config_id string, draw int, precision double, recall double, f1 double,"
    " n_edges long, threshold double, icm double, n_clusters double,"
    " dbcv double, ari double"
)


def _config_id(cfg_dict: dict) -> str:
    return json.dumps(cfg_dict, sort_keys=True, default=str)


def draw_sample(pages: DataFrame, draw: int, keep_of_10: int = 7) -> DataFrame:
    """Deterministic per-draw document subsample: keep urls whose salted
    hash lands in keep_of_10/10 buckets — the engine's bootstrap draw
    (content-derived, partitioning-independent, no RNG state)."""
    return pages.where(
        F.pmod(F.xxhash64(F.col("url"), F.lit(draw)), F.lit(10)) < keep_of_10
    )


def evaluate_unit(
    spark: SparkSession,
    pages: DataFrame,
    gold: DataFrame,
    cfg: LinkConfig,
    draw: int,
    thresholds: list[float],
) -> list[dict]:
    """One work unit: draw → link → pairwise F1 vs gold + threshold grid
    metrics over the scored edges. Returns rows (one per grid point, each
    carrying the unit-level f1 triple; the grid columns are NaN-free)."""
    sample = draw_sample(pages, draw)
    res = link_pipeline(spark, sample, cfg=cfg)
    prf = evaluate_against_gold(res.clusters, gold)
    keyed_labels = (
        gold.select(F.col("gold_key").alias("key"), "entity_id")
        .where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.min("entity_id").alias("entity_id"))
    )
    grid = evaluate_threshold_grid(res.edges, keyed_labels, thresholds)
    n_edges = res.edges.count()
    res.unpersist()
    base = {
        "precision": float(prf["precision"]),
        "recall": float(prf["recall"]),
        "f1": float(prf["f1"]),
        "n_edges": int(n_edges),
    }
    if not grid:
        grid = [
            {"threshold": float(t), "icm": 0.0, "n_clusters": 0,
             "dbcv": float("nan"), "ari": float("nan")}
            for t in thresholds[:1]
        ]
    return [{**base, **g} for g in grid]


def model_selection_run(
    spark: SparkSession,
    pages: DataFrame,
    gold: DataFrame,
    configs: list[dict],
    root: str,
    n_draws: int = 2,
    thresholds: list[float] | None = None,
    fusion_order: int = 2,
    fusion_k: int = 3,
) -> dict:
    """Run (or resume) the selection grid. Returns
    {"units": DataFrame, "leaderboard": DataFrame, "winner": dict,
     "solved": GridOptimum, "fusion_candidates": list}."""
    thresholds = thresholds or [0.85, 0.9, 0.95]
    os.makedirs(root, exist_ok=True)
    input_id = input_identity(pages)

    unit_paths = []
    for cfg_dict in configs:
        cid = _config_id(cfg_dict)
        cfg = LinkConfig(**cfg_dict)
        for draw in range(n_draws):
            fp = run_fingerprint({**cfg_dict, "draw": draw}, input_id)
            path = os.path.join(root, f"unit={fp}")
            unit_paths.append(path)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                continue  # completed-set resume: skip finished work units
            rows = evaluate_unit(spark, pages, gold, cfg, draw, thresholds)
            unit_df = spark.createDataFrame(
                [
                    {
                        "config_id": cid,
                        "draw": draw,
                        "precision": float(r["precision"]),
                        "recall": float(r["recall"]),
                        "f1": float(r["f1"]),
                        "n_edges": int(r["n_edges"]),
                        "threshold": float(r["threshold"]),
                        "icm": float(r["icm"]),
                        "n_clusters": float(r["n_clusters"]),
                        "dbcv": float(r["dbcv"]),
                        "ari": float(r["ari"]),
                    }
                    for r in rows
                ],
                schema=UNIT_SCHEMA,
            )
            unit_df.coalesce(1).write.mode("overwrite").parquet(path)

    units = spark.read.parquet(*unit_paths)

    # A10: pool per-draw unit scores per config; O5: leaderboard best-first
    per_unit = units.select(
        "config_id", "draw", "precision", "recall", "f1", "n_edges"
    ).dropDuplicates(["config_id", "draw"])
    pooled = pool_cv_folds(per_unit, ["config_id"], ["precision", "recall", "f1"])
    leaderboard = pooled.orderBy(F.desc("f1_mean"), "config_id")
    winner = pick_winner_by_pooled_metric(leaderboard, "f1_mean")

    # M10+W7: aggregate the winner's threshold grid across draws and solve
    win_grid = aggregate_grid_metrics(
        units.where(F.col("config_id") == winner["config_id"]).select(
            "threshold", "icm", "n_clusters", "dbcv", "ari"
        ),
        x_col="threshold",
    )
    solved = solve_optimal_grid_point(
        [r.asDict() for r in win_grid.collect()],
        x_col="threshold",
        objective="dbcv_ari_mean_minmax",
    )

    # O4: fusion candidates over pooled singleton scores
    items = [
        (r["config_id"], float(r["f1_mean"]))
        for r in leaderboard.select("config_id", "f1_mean").collect()
    ]
    fusion = top_k_fusion_candidates(items, fusion_order, fusion_k)

    return {
        "units": units,
        "leaderboard": leaderboard,
        "winner": winner,
        "solved": solved,
        "fusion_candidates": fusion,
    }
