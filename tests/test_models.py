"""PCA + linear screener: fit-small / apply-distributed split."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pelinker_spark.models import (
    apply_pca_metrics,
    collect_sample,
    fit_linear_screener,
    fit_pca,
    oov_gate,
    screener_score_col,
)


def test_pca_metrics_distributed(spark):
    em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sample = collect_sample(em.select("vec_id", "embedding"), ["vec_id"], 400)
    model = fit_pca(np.vstack(sample["embedding"].to_numpy()), 8)
    out = apply_pca_metrics(em, "embedding", model)
    pdf = out.select("pca_residual", "pca_mahalanobis", "pca_entropy").toPandas()
    assert (pdf.pca_residual >= 0).all()
    assert pdf.pca_entropy.between(0, np.log(8) + 1e-9).all()
    # determinism across partitioning
    out2 = apply_pca_metrics(em.repartition(7), "embedding", model)
    s1 = out.agg(F.sum(F.round("pca_residual", 9))).collect()[0][0]
    s2 = out2.agg(F.sum(F.round("pca_residual", 9))).collect()[0][0]
    assert abs(s1 - s2) < 1e-6


def test_linear_screener_separates(spark):
    rng = np.random.RandomState(13)
    x0 = rng.standard_normal((300, 16)) + 0.0
    x1 = rng.standard_normal((300, 16)) + 1.0
    model = fit_linear_screener(
        np.vstack([x0, x1]), np.array([0] * 300 + [1] * 300)
    )
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec": [r.astype(float).tolist() for r in np.vstack([x0, x1])],
                "y": [0] * 300 + [1] * 300,
            }
        )
    )
    scored = df.withColumn("score", screener_score_col(F.col("vec"), model))
    acc = (
        scored.where(
            ((F.col("score") > 0) & (F.col("y") == 1))
            | ((F.col("score") <= 0) & (F.col("y") == 0))
        ).count()
        / 600
    )
    assert acc > 0.9
    gated = oov_gate(scored, "score", 0.0)
    assert gated.count() < 600
