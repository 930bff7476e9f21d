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
    → gridsearch.top_k_fusion_candidates over pooled singleton scores;
  - fused re-evaluation (runner.py:584-812): each top-k combination is
    re-run through the SAME checkpointed unit loop as a config whose
    embedding axis is the canonical-ordered concatenation of its members'
    encoder variants — score_pairs builds the fused vectors with
    fusion.fuse_entity_vectors (J3) and the leaderboard extends with the
    pooled fused scores;
  - run-report artifact (runner.py:822-1093, reporting.py:447-484)
    → leaderboard parquet + run_summary.json under `root`.

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
from .fsio import fs_exists, fs_mkdirs, fs_write_text_atomic
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


def _run_units(
    spark: SparkSession,
    pages: DataFrame,
    gold: DataFrame,
    jobs: list[tuple[str, dict]],
    root: str,
    input_id: str,
    n_draws: int,
    thresholds: list[float],
) -> list[str]:
    """Evaluate (or resume) a batch of (config_id, cfg_dict) work units —
    one checkpointed parquet dir per (config, draw), Spark's _SUCCESS as
    the atomicity token. Returns the unit paths (completed + fresh)."""
    unit_paths = []
    for cid, cfg_dict in jobs:
        cfg = LinkConfig(**cfg_dict)
        for draw in range(n_draws):
            fp = run_fingerprint({**cfg_dict, "draw": draw}, input_id)
            path = os.path.join(root, f"unit={fp}")
            unit_paths.append(path)
            # Hadoop-FS existence (fsio): on HDFS/S3 a driver-local
            # os.path.exists is always False and every finished unit would
            # silently re-run on resume (VERDICT r3 #1)
            if fs_exists(spark, os.path.join(path, "_SUCCESS")):
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
    return unit_paths


def fused_config_dict(member_dicts: list[dict]) -> dict:
    """The fused configuration for an order-tuple of singleton configs
    (reference runner.py:618-632: members canonically ordered, combination
    key from the ordered members): pipeline knobs come from the FIRST
    member in canonical order; the embedding axis becomes the
    concatenation of every member's encoder variants, in canonical member
    order (duplicates kept — fusing two sources is meaningful even when
    they share an encoder)."""
    canonical = sorted(member_dicts, key=_config_id)
    base = dict(canonical[0])
    variants: list[str] = []
    for d in canonical:
        variants.extend(d.get("encoder_variants", ["default"]))
    base["encoder_variants"] = variants
    return base


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
    evaluate_fusions: bool = True,
) -> dict:
    """Run (or resume) the selection grid, then re-evaluate the top-k
    fusion candidates on join-fused embedding frames and extend the
    leaderboard (reference runner.py:584-812 — the fused stage runs the
    SAME per-draw evaluation as singletons, checkpointed the same way).
    Returns {"units", "leaderboard", "winner", "solved",
    "fusion_candidates", "fused_config_ids", "report_paths"}."""
    thresholds = thresholds or [0.85, 0.9, 0.95]
    fs_mkdirs(spark, root)
    input_id = input_identity(pages)

    singleton_jobs = [(_config_id(d), d) for d in configs]
    unit_paths = _run_units(
        spark, pages, gold, singleton_jobs, root, input_id, n_draws, thresholds
    )
    units = spark.read.parquet(*unit_paths)

    # A10: pool per-draw unit scores per config; O5: leaderboard best-first
    def build_leaderboard(u: DataFrame) -> DataFrame:
        per_unit = u.select(
            "config_id", "draw", "precision", "recall", "f1", "n_edges"
        ).dropDuplicates(["config_id", "draw"])
        pooled = pool_cv_folds(
            per_unit, ["config_id"], ["precision", "recall", "f1"]
        )
        return pooled.orderBy(F.desc("f1_mean"), "config_id")

    singleton_lb = build_leaderboard(units)

    # O4: fusion candidates over pooled SINGLETON scores
    items = [
        (r["config_id"], float(r["f1_mean"]))
        for r in singleton_lb.select("config_id", "f1_mean").collect()
    ]
    fusion = top_k_fusion_candidates(items, fusion_order, fusion_k)

    # fused re-evaluation stage: each candidate combination becomes a
    # full config (fused embedding axis) and runs through the identical
    # checkpointed unit loop — resume skips completed fused units too
    fused_ids: list[str] = []
    if evaluate_fusions and fusion:
        by_id = {cid: d for cid, d in singleton_jobs}
        fused_jobs = []
        seen: set[str] = set()
        for member_ids, _score in fusion:
            fd = fused_config_dict([by_id[cid] for cid in member_ids])
            fid = _config_id(fd)
            if fid in seen:
                continue
            seen.add(fid)
            fused_jobs.append((fid, fd))
        fused_ids = [fid for fid, _ in fused_jobs]
        unit_paths += _run_units(
            spark, pages, gold, fused_jobs, root, input_id, n_draws, thresholds
        )
        units = spark.read.parquet(*unit_paths)

    leaderboard = build_leaderboard(units)
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

    result = {
        "units": units,
        "leaderboard": leaderboard,
        "winner": winner,
        "solved": solved,
        "fusion_candidates": fusion,
        "fused_config_ids": fused_ids,
    }
    result["report_paths"] = write_selection_report(root, result)
    return result


def write_selection_report(root: str, result: dict) -> dict[str, str]:
    """Run-report artifact (reference runner.py:822-1093 +
    reporting.py:447-484): the pooled leaderboard as a parquet table and a
    JSON summary (winner, solved grid point, fusion shortlist, fused
    config ids) under `root`. Returns {artifact: path}."""
    from dataclasses import asdict

    from .sinks import write_by_extension

    lb_path = os.path.join(root, "leaderboard")
    write_by_extension(result["leaderboard"].coalesce(1), lb_path)
    summary = {
        "winner": result["winner"],
        "solved": asdict(result["solved"]),
        "fusion_candidates": [
            {"members": m, "sum_score": s}
            for m, s in result["fusion_candidates"]
        ],
        "fused_config_ids": result["fused_config_ids"],
    }
    summary_path = os.path.join(root, "run_summary.json")
    # S8 atomic publish through the Hadoop FS (tmp+rename works on
    # hdfs://-style roots, where a local open() would fail outright)
    fs_write_text_atomic(
        result["leaderboard"].sparkSession,
        summary_path,
        json.dumps(summary, indent=2, sort_keys=True, default=str),
    )
    return {"leaderboard": lb_path, "run_summary": summary_path}
