"""Clustering-granularity grid search, aggregation, and plateau solving
(SURVEY.md §2 M10 / A10 / W7 / O4 — the model-selection lifecycle's math).

Reference mapping:
  - evaluate_cluster_size_grid (pelinker/clustering_grid.py:441-504)
    sweeps HDBSCAN min_cluster_size and reports per-point
    (icm, n_clusters, dbcv, ari). The north rule replaces manifold
    clustering with connected components over scored edges, so the
    engine's granularity knob is the EDGE SCORE THRESHOLD: higher
    threshold → fewer edges → more, tighter clusters. The quality column
    kept under the reference's `dbcv` name is the engine's density
    analog: mean intra-cluster edge cosine (cohesion of the kept edges).
  - aggregate_grid_metrics (clustering_grid.py:507-560): per grid point
    mean/std/count across samples — here a Spark groupBy (A10 pooling
    uses the same shape).
  - solve_optimal_min_cluster_size_from_aggregated
    (clustering_grid.py:240-364): smoothed leftmost-plateau selection —
    a pure numpy driver-side function here too (the grid is tiny; the
    reference's own choice is correct at any scale).
  - top_k_fusion_candidates_by_dbcv_proxy
    (clustering_fusion_ranking.py:25-66): rank order-tuples of embeddings
    by summed singleton score before running fused clustering.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from itertools import combinations
from typing import Literal

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import connected_components
from .metrics import adjusted_rand_index

GRID_METRIC_COLS = ("icm", "n_clusters", "dbcv", "ari")


# ------------------------------------------------------------ M10: grid eval
def evaluate_threshold_grid(
    edges: DataFrame,
    keyed_labels: DataFrame | None,
    thresholds: list[float],
    score_col: str = "cos",
    src: str = "key_a",
    dst: str = "key_b",
) -> list[dict]:
    """Evaluate clustering metrics over a grid of edge-score thresholds
    (the engine's M10, mirroring evaluate_cluster_size_grid's output
    columns). For each threshold t: connected components over edges with
    score >= t, then
      n_clusters  — number of components with >= 2 members,
      dbcv        — mean kept-edge score (intra-cluster cohesion analog),
      icm         — std of kept-edge scores (dispersion analog),
      ari         — ARI vs `keyed_labels(key, entity_id)` when provided.
    Returns one dict per grid point (list of rows — the grid is small;
    every metric underneath is computed distributed).
    """
    # Don't steal a caller's cache: if edges is already persisted (e.g.
    # model_selection passes the pipeline's cached res.edges), reuse it and
    # leave it cached on exit — unpersisting would force the caller's next
    # action to recompute the full extract→score lineage (ADVICE r2).
    owns_cache = not edges.is_cached
    if owns_cache:
        edges = edges.persist()
    out: list[dict] = []
    for t in sorted(thresholds):
        kept = edges.where(F.col(score_col) >= F.lit(float(t)))
        stats = kept.agg(
            F.avg(score_col).alias("m"),
            F.stddev_samp(score_col).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        if not stats["n"]:
            continue
        # stats already counted the kept edges — hand the count to CC so
        # its driver/distributed strategy probe costs no extra job
        comp = connected_components(
            kept, src, dst, n_edges=int(stats["n"])
        ).persist()
        n_clusters = (
            comp.groupBy("component").count().where(F.col("count") >= 2).count()
        )
        ari = float("nan")
        if keyed_labels is not None:
            labeled = comp.join(keyed_labels, "key")
            ari = adjusted_rand_index(labeled, "component", "entity_id")
        comp.unpersist()
        out.append(
            {
                "threshold": float(t),
                "icm": float(stats["s"]) if stats["s"] is not None else 0.0,
                "n_clusters": int(n_clusters),
                "dbcv": float(stats["m"]),
                "ari": ari,
            }
        )
    if owns_cache:
        edges.unpersist()
    return out


# ----------------------------------------------------- A10-shaped aggregation
def aggregate_grid_metrics(
    metrics: DataFrame, x_col: str = "threshold"
) -> DataFrame:
    """Per-grid-point mean/std/count across samples (reference
    aggregate_grid_metrics, clustering_grid.py:507-560): dbcv and ari keep
    (mean, std, count) so uncertainty survives; icm and n_clusters are
    diagnostic means. std of a single sample is 0.0, not null. Sorted by
    the grid column. Pure groupBy — one shuffle on the (tiny) grid key."""
    return (
        metrics.groupBy(x_col)
        .agg(
            F.avg("dbcv").alias("dbcv_mean"),
            F.coalesce(F.stddev_samp("dbcv"), F.lit(0.0)).alias("dbcv_std"),
            F.count("dbcv").alias("dbcv_count"),
            F.avg("icm").alias("icm_mean"),
            F.avg("n_clusters").alias("n_clusters_mean"),
            F.avg("ari").alias("ari_mean"),
            F.coalesce(F.stddev_samp("ari"), F.lit(0.0)).alias("ari_std"),
            F.count("ari").alias("ari_count"),
        )
        .orderBy(x_col)
    )


def pool_cv_folds(
    fold_metrics: DataFrame,
    group_cols: list[str],
    metric_cols: list[str],
) -> DataFrame:
    """A10: pool per-fold metric rows to (mean, std[ddof=1], count) per
    group (reference _metrics_from_fold_lists, analysis.py:600-618) — one
    hash aggregate."""
    aggs = []
    for m in metric_cols:
        aggs += [
            F.avg(m).alias(f"{m}_mean"),
            F.coalesce(F.stddev_samp(m), F.lit(0.0)).alias(f"{m}_std"),
            F.count(m).alias(f"{m}_count"),
        ]
    return fold_metrics.groupBy(*group_cols).agg(*aggs)


def pick_winner_by_pooled_metric(
    pooled: DataFrame, metric_mean_col: str = "auc_mean"
) -> dict:
    """Winner row by pooled metric, deterministic tiebreak on the full row
    (reference picks the ROC winner on pooled OOS predictions,
    analysis.py:628-722)."""
    row = (
        pooled.orderBy(F.desc(metric_mean_col), *pooled.columns)
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("empty pooled metrics")
    return row[0].asDict()


# -------------------------------------------------------- W7: plateau solver
@dataclass(frozen=True)
class GridOptimum:
    """Mirror of the reference's SmoothedGridOptimumResult
    (clustering_grid.py:56-74) with the engine's generic grid column."""

    chosen_x: float
    score_mean_at_chosen: float
    score_std_at_chosen: float
    n_clusters_mean_at_chosen: float
    x: tuple[float, ...]
    y_objective: tuple[float, ...]
    y_cluster_term: tuple[float, ...]
    y_smooth: tuple[float, ...]
    dy_dx: tuple[float, ...]
    selection: Literal["plateau_derivative", "smoothed_argmax"]


def _centered_moving_average(
    y: np.ndarray, window: int, weights: np.ndarray | None
) -> np.ndarray:
    w = window if window % 2 == 1 else window + 1
    if window < 1:
        raise ValueError("smooth window must be >= 1")
    half = w // 2
    n = len(y)
    out = np.empty(n)
    for i in range(n):
        lo, hi = max(0, i - half), min(n, i + half + 1)
        if weights is None:
            out[i] = float(np.mean(y[lo:hi]))
        else:
            pw = weights[lo:hi]
            denom = float(np.sum(pw))
            out[i] = float(np.sum(pw * y[lo:hi]) / denom) if denom > 0 else float("nan")
    return out


def _minmax01(v: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """F11 min-max [0,1] normalization over finite values; constant → 1.0."""
    out = np.full_like(v, np.nan, dtype=np.float64)
    fin = np.isfinite(v)
    if not fin.any():
        return out
    lo, hi = float(np.min(v[fin])), float(np.max(v[fin]))
    out[fin] = 1.0 if hi - lo <= eps else (v[fin] - lo) / (hi - lo)
    return out


def _objective_vectors(
    points: list[dict], objective: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    def vec(which):
        m = np.array([p[f"{which}_mean"] for p in points], dtype=np.float64)
        s = np.array([p[f"{which}_std"] for p in points], dtype=np.float64)
        c = np.array([p[f"{which}_count"] for p in points], dtype=np.float64)
        return m, s, c

    if objective in ("dbcv", "ari"):
        return vec(objective)
    if objective in ("dbcv_ari_mean_minmax", "dbcv_ari_mean_raw"):
        md, sd, cd = vec("dbcv")
        ma, sa, ca = vec("ari")
        use_minmax = objective.endswith("minmax")
        v1 = _minmax01(md) if use_minmax else md
        v2 = _minmax01(ma) if use_minmax else ma
        n = len(md)
        means = np.empty(n)
        stds = np.empty(n)
        counts = np.empty(n)
        for i in range(n):
            f1 = np.isfinite(v1[i]) and np.isfinite(md[i])
            f2 = np.isfinite(v2[i]) and np.isfinite(ma[i])
            if f1 and f2:
                means[i] = 0.5 * (v1[i] + v2[i])
                stds[i] = math.sqrt((sd[i] ** 2 + sa[i] ** 2) / 4.0)
                counts[i] = min(cd[i], ca[i])
            elif f1:
                means[i], stds[i], counts[i] = v1[i], sd[i], cd[i]
            elif f2:
                means[i], stds[i], counts[i] = v2[i], sa[i], ca[i]
            else:
                means[i], stds[i], counts[i] = float("nan"), float("nan"), 0.0
        return means, stds, counts
    raise ValueError(f"Unknown grid objective: {objective!r}")


def solve_optimal_grid_point(
    points: list[dict],
    x_col: str = "threshold",
    objective: str = "dbcv",
    method: str = "mean",
    uncertainty_penalty: float = 1.0,
    smooth_window: int = 3,
    plateau_fraction: float = 0.92,
    derivative_rel_tol: float = 0.12,
    precision_weighted_smooth: bool | None = None,
    cluster_count_reward: float = 0.0,
    n_entities: int | None = None,
) -> GridOptimum:
    """W7: choose the grid point from aggregated noisy scores (reference
    solve_optimal_min_cluster_size_from_aggregated,
    clustering_grid.py:240-364): build f(x) from the objective, optionally
    penalize uncertainty (lower_bound) and reward cluster count
    (log n/n_ref), smooth with a centered moving average (precision-
    weighted for lower_bound/weighted), then take the LEFTMOST x where the
    smoothed curve is within plateau_fraction of its range top AND |df/dx|
    is small; fall back to the smoothed argmax.

    `points`: dicts with x_col plus {dbcv,ari}_{mean,std,count} and
    n_clusters_mean (the aggregate_grid_metrics row shape)."""
    if not points:
        raise ValueError("No aggregated grid points provided")
    if cluster_count_reward < 0:
        raise ValueError("cluster_count_reward must be >= 0")
    if method not in ("mean", "lower_bound", "weighted"):
        raise ValueError(f"Unknown optimization method: {method!r}")

    x = np.array([p[x_col] for p in points], dtype=np.float64)
    n_clusters_all = np.array(
        [p.get("n_clusters_mean", float("nan")) for p in points], dtype=np.float64
    )
    base_means, stds, counts = _objective_vectors(points, objective)
    y = base_means.copy()
    if method == "lower_bound":
        y = base_means - uncertainty_penalty * stds

    if cluster_count_reward > 0:
        n_clust = np.maximum(np.nan_to_num(n_clusters_all, nan=1.0), 1.0)
        n_ref = float(n_entities) if n_entities else float(np.max(n_clust))
        cluster_term = (
            cluster_count_reward * np.log(n_clust / n_ref) if n_ref > 0
            else np.zeros_like(n_clust)
        )
    else:
        cluster_term = np.zeros_like(x)
    y = y + cluster_term

    finite = np.isfinite(x) & np.isfinite(y)
    if not finite.any():
        raise ValueError("No finite objective values in aggregated grid")
    order = np.argsort(x[finite])

    def take(v):
        return v[finite][order]

    x, y = take(x), take(y)
    base_means, stds, counts = take(base_means), take(stds), take(counts)
    n_clusters_all, cluster_term = take(n_clusters_all), take(cluster_term)

    if precision_weighted_smooth is None:
        precision_weighted_smooth = method in ("lower_bound", "weighted")
    weights = (
        counts / (stds * stds + 1e-8) if precision_weighted_smooth else None
    )
    y_s = _centered_moving_average(y, smooth_window, weights)
    dydx = np.gradient(y_s, x) if len(x) > 1 else np.zeros_like(x)

    fin_s = np.isfinite(y_s)
    if not fin_s.any():
        raise ValueError("Smoothed objective is non-finite")
    y_max, y_min = float(np.max(y_s[fin_s])), float(np.min(y_s[fin_s]))
    scale = float(np.nanmax(np.abs(dydx)))
    if not np.isfinite(scale) or scale <= 0:
        scale = 1.0
    thresh = derivative_rel_tol * scale
    level = y_min + plateau_fraction * (y_max - y_min)

    chosen: int | None = None
    selection: Literal["plateau_derivative", "smoothed_argmax"] = "smoothed_argmax"
    for i in range(len(x)):
        if not (np.isfinite(y_s[i]) and np.isfinite(dydx[i])):
            continue
        if y_s[i] >= level and abs(dydx[i]) <= thresh:
            chosen, selection = i, "plateau_derivative"
            break
    if chosen is None:
        chosen = int(np.nanargmax(y_s))

    return GridOptimum(
        chosen_x=float(x[chosen]),
        score_mean_at_chosen=float(base_means[chosen]),
        score_std_at_chosen=float(stds[chosen]),
        n_clusters_mean_at_chosen=float(n_clusters_all[chosen]),
        x=tuple(map(float, x)),
        y_objective=tuple(map(float, y)),
        y_cluster_term=tuple(map(float, cluster_term)),
        y_smooth=tuple(map(float, y_s)),
        dy_dx=tuple(map(float, dydx)),
        selection=selection,
    )


# ------------------------------------------------------- O4: fusion ranking
def top_k_fusion_candidates(
    items: list[tuple],
    order: int,
    k: int,
) -> list[tuple[list, float]]:
    """O4: up to k distinct order-tuples of distinct embeddings with the
    highest summed singleton score (reference
    top_k_fusion_candidates_by_dbcv_proxy,
    clustering_fusion_ranking.py:25-66). `items` = [(identity, score),
    ...]; identity is any hashable (e.g. (model, layer)). Returns
    [([identities in combination order], sum_score), ...], deduped by the
    sorted identity tuple, ties broken by combination index order."""
    if order < 2 or k < 1 or len(items) < order:
        return []
    scored = []
    for idxs in combinations(range(len(items)), order):
        scored.append((sum(items[i][1] for i in idxs), idxs))
    scored.sort(key=lambda t: (-t[0], t[1]))
    seen: set = set()
    out: list[tuple[list, float]] = []
    for s, idxs in scored:
        key = tuple(sorted(items[i][0] for i in idxs))
        if key in seen:
            continue
        seen.add(key)
        out.append(([items[i][0] for i in idxs], float(s)))
        if len(out) >= k:
            break
    return out
