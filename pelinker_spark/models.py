"""Model-fit operators: fit on a bounded driver-side sample, apply
distributed — the reference's split exactly (PCA fit transform.py:133-166
on a <=100k-row stratified sample, screeners ambient_screener.py:128-199,
anomaly metrics transform.py:111-131; applied to the full table via
broadcast state).

Fitting uses plain numpy (SVD / closed-form LDA) — deterministic, no
sklearn dependency. Application is distributed two ways:

- linear models (screener scores) become *pure column algebra*: the weight
  vector is inlined as a literal array and the dot product runs in
  zip_with/aggregate — no Python at all on the scoring path (SURVEY §2.9
  M9: "linear models need no UDF");
- matrix models (PCA projection + anomaly metrics) run as an Arrow-batched
  pandas UDF over numpy broadcast state.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sampling import hash_fraction_sample


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d)
    explained_var: np.ndarray  # (k,)


def collect_sample(df: DataFrame, key_cols: list[str], max_rows: int) -> pd.DataFrame:
    """Bounded deterministic driver-side sample (reference screener_max_rows
    discipline, config.py:289-290): hash-fraction prune then exact cap."""
    n = df.count()
    if n > max_rows:
        frac = min(1.0, 1.5 * max_rows / n)
        df = hash_fraction_sample(df, key_cols, frac)
    return df.limit(max_rows).toPandas()


def fit_pca(vectors: np.ndarray, n_components: int) -> PCAModel:
    """Deterministic PCA via numpy SVD (sign-fixed so results never depend
    on LAPACK sign conventions)."""
    mean = vectors.mean(axis=0)
    x = vectors - mean
    _, s, vt = np.linalg.svd(x, full_matrices=False)
    comp = vt[:n_components]
    # sign fix: largest-|loading| coordinate is made positive
    signs = np.sign(comp[np.arange(len(comp)), np.abs(comp).argmax(axis=1)])
    signs[signs == 0] = 1.0
    comp = comp * signs[:, None]
    var = (s[:n_components] ** 2) / max(len(x) - 1, 1)
    return PCAModel(mean=mean, components=comp, explained_var=var)


def apply_pca_metrics(df: DataFrame, vec_col: str, model: PCAModel) -> DataFrame:
    """Adds pca_coords (array<float>), pca_residual, pca_mahalanobis,
    pca_entropy — the reference's anomaly trio (_compute_pca_metrics,
    transform.py:111-131) as one Arrow-batched pandas UDF."""
    mean_b = model.mean
    comp_b = model.components
    inv_sd = 1.0 / np.sqrt(np.maximum(model.explained_var, 1e-12))

    out_t = T.StructType(
        [
            T.StructField("pca_coords", T.ArrayType(T.FloatType())),
            T.StructField("pca_residual", T.DoubleType()),
            T.StructField("pca_mahalanobis", T.DoubleType()),
            T.StructField("pca_entropy", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def metrics(vs: pd.Series) -> pd.DataFrame:
        x = np.vstack(vs.to_numpy()) - mean_b
        coords = x @ comp_b.T
        recon = coords @ comp_b
        residual = np.linalg.norm(x - recon, axis=1)
        maha = np.linalg.norm(coords * inv_sd, axis=1)
        p = coords**2
        p = p / np.maximum(p.sum(axis=1, keepdims=True), 1e-12)
        entropy = -(p * np.log(np.maximum(p, 1e-12))).sum(axis=1)
        return pd.DataFrame(
            {
                "pca_coords": list(coords.astype(np.float32)),
                "pca_residual": residual,
                "pca_mahalanobis": maha,
                "pca_entropy": entropy,
            }
        )

    m = metrics(F.col(vec_col))
    return df.withColumn("_m", m).select(
        "*", "_m.pca_coords", "_m.pca_residual", "_m.pca_mahalanobis", "_m.pca_entropy"
    ).drop("_m")


@dataclass
class LinearScreener:
    weights: np.ndarray  # (d,)
    bias: float


def fit_linear_screener(vectors: np.ndarray, labels: np.ndarray,
                        reg: float = 1e-3) -> LinearScreener:
    """Closed-form LDA direction w = (Sigma + reg I)^-1 (mu1 - mu0),
    bias centers the midpoint (reference's negative-vs-KB binary screener,
    ambient_screener.py:128-199, re-fit deterministically)."""
    x0, x1 = vectors[labels == 0], vectors[labels == 1]
    mu0, mu1 = x0.mean(axis=0), x1.mean(axis=0)
    xc = np.vstack([x0 - mu0, x1 - mu1])
    cov = (xc.T @ xc) / max(len(xc) - 2, 1) + reg * np.eye(vectors.shape[1])
    w = np.linalg.solve(cov, mu1 - mu0)
    b = -float(w @ ((mu0 + mu1) / 2))
    return LinearScreener(weights=w, bias=b)


def screener_score_col(vec_col: Column, model: LinearScreener) -> Column:
    """dot(vec, w) + b as pure column algebra — weights inlined as a
    literal array, whole-stage-codegen'd, zero Python."""
    w = F.array(*[F.lit(float(x)) for x in model.weights])
    return (
        F.aggregate(
            F.zip_with(vec_col, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(model.bias)
    )


def oov_gate(df: DataFrame, score_col: str, threshold: float) -> DataFrame:
    """P8: drop rows whose anomaly score exceeds the gate (reference
    projection_screener.py:88-89 applied at model.py:1600-1601)."""
    return df.where(F.col(score_col) <= threshold)
