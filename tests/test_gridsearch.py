"""Grid aggregation, plateau solver, fusion ranking, CV pooling — mirrors
the reference test goldens (test/test_clustering_grid_solver.py,
test/test_clustering_fusion_ranking.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pelinker_spark.gridsearch import (
    aggregate_grid_metrics,
    evaluate_threshold_grid,
    pick_winner_by_pooled_metric,
    pool_cv_folds,
    solve_optimal_grid_point,
    top_k_fusion_candidates,
)


def _points(xs, means, stds, counts, n_clusters=None):
    n_clusters = n_clusters or [float("nan")] * len(xs)
    return [
        {
            "threshold": x,
            "dbcv_mean": m,
            "dbcv_std": s,
            "dbcv_count": c,
            "ari_mean": float("nan"),
            "ari_std": 0.0,
            "ari_count": 0,
            "n_clusters_mean": nc,
        }
        for x, m, s, c, nc in zip(xs, means, stds, counts, n_clusters)
    ]


def test_solve_empty_raises():
    with pytest.raises(ValueError, match="No aggregated"):
        solve_optimal_grid_point([])


def test_solve_plateau_prefers_leftmost_high_flat_region():
    xs = [10, 15, 20, 25, 30, 35, 40]
    means = [0.1, 0.2, 0.5, 1.5, 2.0, 2.01, 2.0]
    out = solve_optimal_grid_point(
        _points(xs, means, [0.05] * 7, [10] * 7),
        method="mean",
        smooth_window=3,
        plateau_fraction=0.9,
        derivative_rel_tol=0.2,
        precision_weighted_smooth=False,
    )
    assert out.selection == "plateau_derivative"
    assert out.chosen_x in {25, 30, 35}
    assert out.score_mean_at_chosen == pytest.approx(means[xs.index(out.chosen_x)])


def test_solve_smoothed_argmax_when_no_plateau():
    out = solve_optimal_grid_point(
        _points([10, 15, 20, 25, 30], [0.1, 0.4, 0.7, 1.0, 1.3], [0.01] * 5, [5] * 5),
        method="mean",
        smooth_window=3,
        plateau_fraction=0.999,
        derivative_rel_tol=1e-9,
        precision_weighted_smooth=False,
    )
    assert out.selection == "smoothed_argmax"
    assert out.chosen_x == 30


def test_solve_lower_bound_objective():
    out = solve_optimal_grid_point(
        _points([10, 20], [0.2, 1.0], [0.05, 0.01], [5, 5]),
        method="lower_bound",
        uncertainty_penalty=1.0,
        smooth_window=1,
        plateau_fraction=0.9,
        derivative_rel_tol=1.0,
        precision_weighted_smooth=False,
    )
    assert out.chosen_x == 20


def test_solve_unknown_method_and_objective_raise():
    pts = _points([10], [1.0], [0.0], [1])
    with pytest.raises(ValueError, match="Unknown optimization method"):
        solve_optimal_grid_point(pts, method="nope")
    with pytest.raises(ValueError, match="Unknown grid objective"):
        solve_optimal_grid_point(pts, objective="not_an_objective")


def test_noisy_dbcv_does_not_pick_spurious_early_plateau():
    """Reference regression golden (test_clustering_grid_solver.py:207)."""
    xs = [10, 15, 20, 25, 30, 35, 40, 45, 50, 55]
    means = [0.399424, 0.379638, 0.412020, 0.369532, 0.414304,
             0.389333, 0.400889, 0.402151, 0.396124, 0.464974]
    out = solve_optimal_grid_point(
        _points(xs, means, [0.02] * 10, [5] * 10),
        objective="dbcv",
        method="mean",
        smooth_window=3,
        plateau_fraction=0.92,
        derivative_rel_tol=0.12,
        precision_weighted_smooth=False,
    )
    assert out.chosen_x == 55


def test_cluster_count_reward_prefers_more_clusters_on_flat_dbcv():
    xs = [20, 40, 60, 80]
    means = [0.70, 0.71, 0.69, 0.70]
    ncl = [120.0, 80.0, 60.0, 50.0]
    kw = dict(
        objective="dbcv", method="mean", smooth_window=1,
        plateau_fraction=0.5, derivative_rel_tol=1.0,
        precision_weighted_smooth=False,
    )
    without = solve_optimal_grid_point(
        _points(xs, means, [0.02] * 4, [5] * 4, ncl), cluster_count_reward=0.0, **kw
    )
    with_reward = solve_optimal_grid_point(
        _points(xs, means, [0.02] * 4, [5] * 4, ncl), cluster_count_reward=0.15, **kw
    )
    assert without.chosen_x >= with_reward.chosen_x
    assert with_reward.chosen_x == 20
    assert with_reward.y_cluster_term[0] == pytest.approx(0.0)
    assert all(t <= 0.0 for t in with_reward.y_cluster_term)
    with pytest.raises(ValueError, match="cluster_count_reward"):
        solve_optimal_grid_point(_points(xs, means, [0.02] * 4, [5] * 4, ncl),
                                 cluster_count_reward=-0.1)


def test_finite_mask_drops_non_finite_objective():
    out = solve_optimal_grid_point(
        _points([10, 15, 20], [float("nan"), 1.0, 2.0], [0.0] * 3, [1] * 3),
        smooth_window=1,
        plateau_fraction=0.99,
        derivative_rel_tol=1e-9,
        precision_weighted_smooth=False,
    )
    assert out.chosen_x in (15, 20)
    assert all(np.isfinite(v) for v in out.y_objective)


def test_aggregate_grid_metrics_preserves_std_and_count(spark):
    a = pd.DataFrame({"threshold": [0.8, 0.9], "icm": [0.1, 0.2],
                      "n_clusters": [3, 4], "dbcv": [0.5, 0.6], "ari": [0.3, 0.4]})
    b = pd.DataFrame({"threshold": [0.8, 0.9], "icm": [0.15, 0.25],
                      "n_clusters": [3, 5], "dbcv": [0.7, 0.4], "ari": [0.5, 0.35]})
    agg = aggregate_grid_metrics(
        spark.createDataFrame(pd.concat([a, b])), x_col="threshold"
    ).toPandas().set_index("threshold")
    p = agg.loc[0.8]
    assert p.dbcv_mean == pytest.approx(0.6)
    assert p.dbcv_count == 2
    assert p.dbcv_std == pytest.approx(np.std([0.5, 0.7], ddof=1))
    assert p.ari_mean == pytest.approx(0.4)
    assert p.ari_std == pytest.approx(np.std([0.3, 0.5], ddof=1))
    # single-sample std is 0.0, not null
    solo = aggregate_grid_metrics(spark.createDataFrame(a), x_col="threshold")
    assert solo.where(F.col("dbcv_std") != 0.0).count() == 0


def test_top_k_fusion_candidates_golden():
    items = [("m1", 0.9), ("m2", 0.8), ("m3", 0.5), ("m4", 0.1)]
    out = top_k_fusion_candidates(items, order=2, k=3)
    assert [set(ids) for ids, _ in out] == [
        {"m1", "m2"}, {"m1", "m3"}, {"m2", "m3"}]
    assert out[0][1] == pytest.approx(1.7)
    # degenerate inputs
    assert top_k_fusion_candidates(items, order=1, k=3) == []
    assert top_k_fusion_candidates(items[:1], order=2, k=3) == []
    # dedupe by identity: duplicate identities collapse
    dup = [("a", 0.9), ("a", 0.8), ("b", 0.5)]
    out2 = top_k_fusion_candidates(dup, order=2, k=5)
    keys = [tuple(sorted(ids)) for ids, _ in out2]
    assert len(keys) == len(set(keys))


def test_pool_cv_folds_and_winner(spark):
    rows = pd.DataFrame({
        "model": ["lda", "lda", "lda", "svm", "svm", "svm"],
        "fold": [0, 1, 2, 0, 1, 2],
        "auc": [0.9, 0.8, 0.85, 0.7, 0.72, 0.71],
        "f1": [0.8, 0.75, 0.78, 0.6, 0.62, 0.61],
    })
    pooled = pool_cv_folds(spark.createDataFrame(rows), ["model"], ["auc", "f1"])
    p = pooled.toPandas().set_index("model")
    assert p.loc["lda", "auc_mean"] == pytest.approx(np.mean([0.9, 0.8, 0.85]))
    assert p.loc["lda", "auc_std"] == pytest.approx(np.std([0.9, 0.8, 0.85], ddof=1))
    assert p.loc["lda", "auc_count"] == 3
    winner = pick_winner_by_pooled_metric(pooled, "auc_mean")
    assert winner["model"] == "lda"


def test_evaluate_threshold_grid(spark):
    edges = spark.createDataFrame(pd.DataFrame({
        "key_a": ["a", "b", "x", "p"],
        "key_b": ["b", "c", "y", "q"],
        "cos":   [0.99, 0.95, 0.91, 0.86],
    }))
    labels = spark.createDataFrame(pd.DataFrame({
        "key": ["a", "b", "c", "x", "y", "p", "q"],
        "entity_id": ["E1", "E1", "E1", "E2", "E2", "E3", "E4"],
    }))
    grid = evaluate_threshold_grid(edges, labels, [0.85, 0.9, 0.97])
    by_t = {g["threshold"]: g for g in grid}
    # at 0.85: components {a,b,c},{x,y},{p,q} -> 3 clusters
    assert by_t[0.85]["n_clusters"] == 3
    # at 0.9: {a,b,c},{x,y} -> 2; at 0.97: {a,b} -> 1
    assert by_t[0.9]["n_clusters"] == 2
    assert by_t[0.97]["n_clusters"] == 1
    # perfect agreement with entities at 0.9 (p/q singletons drop out of ARI
    # cells only via the join — they are their own components)
    assert by_t[0.9]["ari"] > 0.8
    assert by_t[0.85]["dbcv"] == pytest.approx(np.mean([0.99, 0.95, 0.91, 0.86]))
