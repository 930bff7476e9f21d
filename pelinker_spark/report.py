"""Cluster reporting operators: composition, weighted mass, consensus
naming, overlap dedup — the reference's post-clustering analysis layer
re-expressed as DataFrame plans.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cluster_composition(labeled: DataFrame, cluster_col: str = "cluster_id",
                        entity_col: str = "key") -> DataFrame:
    """Per (cluster, entity) mass with the two normalizations of the
    reference (cluster_composition_from_training_frame,
    linker_cluster_training.py:23-61): fraction of the cluster and
    fraction of the entity — two window sums, no CUBE needed."""
    base = labeled.groupBy(cluster_col, entity_col).agg(
        F.count("*").cast("double").alias("n")
    )
    return base.select(
        cluster_col,
        entity_col,
        "n",
        (F.col("n") / F.sum("n").over(Window.partitionBy(cluster_col))).alias(
            "frac_of_cluster"
        ),
        (F.col("n") / F.sum("n").over(Window.partitionBy(entity_col))).alias(
            "frac_of_entity"
        ),
    )


def weighted_cluster_mass(labeled: DataFrame, cluster_col: str = "cluster_id",
                          entity_col: str = "key") -> DataFrame:
    """Head-entity-damped mass: weight 1/sqrt(n_mentions(entity)) per row,
    summed per (cluster, entity) (reference entity_mention_weights +
    aggregate_cluster_entity_mass, cluster_composition_viz.py:18-81)."""
    per_entity = labeled.groupBy(entity_col).agg(F.count("*").alias("__ne"))
    return (
        labeled.join(per_entity, entity_col)
        .withColumn("__w", F.lit(1.0) / F.sqrt(F.col("__ne")))
        .groupBy(cluster_col, entity_col)
        .agg(F.sum("__w").alias("mass"), F.count("*").alias("n"))
    )


def consensus_labels(
    composition: DataFrame,
    cluster_col: str = "cluster_id",
    entity_col: str = "key",
    top_n: int = 3,
    min_fraction: float = 0.1,
) -> DataFrame:
    """Top-n entity labels per cluster with fraction >= min_fraction,
    ordered by (-fraction, label) (reference cluster_derived_labels_map,
    linker_cluster_training.py:151-196)."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("frac_of_cluster"), F.asc(entity_col)
    )
    return (
        composition.where(F.col("frac_of_cluster") >= min_fraction)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .groupBy(cluster_col)
        .agg(
            F.collect_list(F.struct("rank", entity_col, "frac_of_cluster")).alias(
                "top_labels"
            )
        )
    )


def modal_assignment(labeled: DataFrame, entity_col: str = "key",
                     cluster_col: str = "cluster_id") -> DataFrame:
    """Modal cluster per entity, ties to smallest cluster id (reference
    _modal_cluster_deterministic, linker_cluster_training.py:12-20)."""
    cnt = labeled.groupBy(entity_col, cluster_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(entity_col).orderBy(F.desc("n"), F.asc(cluster_col))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(entity_col, F.col(cluster_col).alias("modal_cluster"), "n")
    )


def cluster_cosine_std(
    labeled: DataFrame,
    cluster_col: str = "cluster_id",
    vec_col: str = "embed",
    max_rows_per_cluster: int = 200,
) -> DataFrame:
    """A11: per-cluster std of pairwise cosine similarity, computed on a
    deterministic hash-capped sample per cluster (reference
    cosine_similarity_std, clustering_grid.py:388-423, with its max_pairs
    sampling). Bounded cluster samples → the gram matrix fits one Arrow
    batch, so the pairwise part runs in applyInPandas per cluster."""
    import numpy as np

    from .sampling import cap_per_group

    capped = cap_per_group(
        labeled.select(cluster_col, vec_col),
        [cluster_col],
        max_rows_per_cluster,
        [vec_col],
    )
    out_schema = T.StructType(
        [
            T.StructField(cluster_col, labeled.schema[cluster_col].dataType, True),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("cos_std", T.DoubleType(), True),
            T.StructField("cos_mean", T.DoubleType(), True),
        ]
    )

    # fully-annotated signature: pyspark infers the (key, pdf) eval type
    # from the hints; a partially-hinted function triggers a per-plan
    # "cannot infer eval type" UserWarning and falls back to arity sniffing
    def per_cluster(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.vstack(pdf[vec_col].to_numpy()).astype(float)
        n = len(x)
        if n < 2:
            return pd.DataFrame(
                {cluster_col: [key[0]], "n": [n], "cos_std": [None], "cos_mean": [None]}
            )
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        g = x @ x.T
        iu = np.triu_indices(n, k=1)
        sims = g[iu]
        return pd.DataFrame(
            {
                cluster_col: [key[0]],
                "n": [n],
                "cos_std": [float(sims.std(ddof=0))],
                "cos_mean": [float(sims.mean())],
            }
        )

    return capped.groupBy(cluster_col).applyInPandas(per_cluster, out_schema)


_DEDUP_SCHEMA_SUFFIX = [
    T.StructField("overlap_component", T.LongType(), True),
    T.StructField("is_best", T.BooleanType(), True),
]


def dedupe_overlapping_mentions(
    mentions: DataFrame,
    score_col: str | None = None,
    doc_cols: tuple[str, str] = ("url", "itext"),
) -> DataFrame:
    """Within each document, group mentions whose [a_abs, b_abs) spans
    overlap (connected components of the interval-overlap graph) and mark
    the best row per component: max score (if given), then min span
    length, then min mention string (reference
    _dedupe_overlapping_prediction_rows, model.py:1138-1208, union-find
    :1156-1195).

    Per-document graphs are tiny, so the union-find runs inside an
    Arrow-batched applyInPandas per (url, itext) group — the distributed
    frame never materializes the O(n^2) overlap pairs."""
    out_schema = T.StructType(
        list(mentions.schema.fields) + _DEDUP_SCHEMA_SUFFIX
    )
    score = score_col

    def dedupe(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        pdf = pdf.sort_values(["a_abs", "b_abs"]).reset_index(drop=True)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # sweep: intervals sorted by start; overlap iff next.start < cur max end
        active: list[tuple[int, int]] = []  # (end, idx)
        for i in range(n):
            a, b = pdf.a_abs.iat[i], pdf.b_abs.iat[i]
            active = [(e, j) for e, j in active if e > a]
            for _, j in active:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            active.append((b, i))
        comp = [find(i) for i in range(n)]
        pdf["overlap_component"] = comp
        span_len = pdf.b_abs - pdf.a_abs
        order = pd.DataFrame(
            {
                "c": comp,
                "neg_score": -pdf[score] if score else 0.0,
                "len": span_len,
                "mention": pdf["mention"],
            }
        )
        best_idx = order.sort_values(["c", "neg_score", "len", "mention"]).groupby("c").head(1).index
        pdf["is_best"] = pdf.index.isin(best_idx)
        return pdf

    return mentions.groupBy(*doc_cols).applyInPandas(dedupe, out_schema)
