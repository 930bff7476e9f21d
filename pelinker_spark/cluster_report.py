"""Cluster-composition snapshot artifacts (SURVEY.md §2 A4/A5/W2 report
assembly — VERDICT r1 gap #5).

Reference semantics (pelinker/linker_cluster_training.py:23-196,
reporting.py:447-484): from a labeled mention frame, build
  1. the composition snapshot — per (cluster, entity) mention mass with
     within-cluster fraction and capture-of-entity-mass fraction;
  2. consensus cluster names — single / near-uniform-admixture (hyphen
     join) / dominant-entity naming with _A/_B disambiguation;
  3. cluster-derived labels — entity_id → "top / entities / joined" name;
and write the three artifact tables.

Spark-first: composition is two hash aggregates + one window; naming
collapses each cluster's (small) entity mixture with sort_array/collect
aggregates — the per-cluster mixture is bounded by the entity vocabulary,
never by corpus size, so the collect is scale-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_composition(
    labeled: DataFrame,
    cluster_col: str = "cluster_id",
    entity_col: str = "entity_id",
) -> DataFrame:
    """(cluster, entity, n, within_fraction, capture_fraction): rows are
    weighted equally (each row = one mention); within is relative to the
    cluster's total mass, capture to the entity's global mass (reference
    cluster_composition_from_training_frame,
    linker_cluster_training.py:23-63)."""
    cell = labeled.groupBy(cluster_col, entity_col).agg(F.count("*").alias("n"))
    w_cl = Window.partitionBy(cluster_col)
    w_en = Window.partitionBy(entity_col)
    return cell.select(
        cluster_col,
        entity_col,
        "n",
        (F.col("n") / F.sum("n").over(w_cl)).alias("within_fraction"),
        (F.col("n") / F.sum("n").over(w_en)).alias("capture_fraction"),
    )


def consensus_cluster_names(
    composition: DataFrame,
    cluster_col: str = "cluster_id",
    entity_col: str = "entity_id",
    uniform_width_tol: float = 0.15,
    dominance_min_share: float = 0.52,
    dominance_min_gap: float = 0.12,
) -> DataFrame:
    """(cluster, name): single-entity clusters take the entity name;
    near-uniform admixtures (share spread <= min(tol, 0.5/k)) take the
    hyphen-joined sorted entity names; a clear dominant (share >= min_share
    and gap >= min_gap over the runner-up, ties to the smaller name) takes
    its name; the rest hyphen-join. Duplicate names get _A/_B/... suffixes
    in cluster-id order (reference consensus_cluster_names,
    linker_cluster_training.py:96-150)."""
    ranked = composition.groupBy(cluster_col).agg(
        F.count("*").alias("k"),
        (F.max("within_fraction") - F.min("within_fraction")).alias("width"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("within_fraction")).alias("negf"),
                    F.col(entity_col).alias("e"),
                )
            )
        ).alias("mix"),
        F.array_join(F.sort_array(F.collect_list(entity_col)), "-").alias("hyphen"),
    )
    top = F.element_at("mix", 1)
    second = F.element_at("mix", 2)
    base = (
        F.when(F.col("k") == 1, top["e"])
        .when(
            F.col("width")
            <= F.least(F.lit(uniform_width_tol), F.lit(0.5) / F.col("k")),
            F.col("hyphen"),
        )
        .when(
            (-top["negf"] >= dominance_min_share)
            & ((second["negf"] - top["negf"]) >= dominance_min_gap),
            top["e"],
        )
        .otherwise(F.col("hyphen"))
    )
    named = ranked.select(cluster_col, base.alias("base"))
    # _A/_B disambiguation: stable by cluster id within each name bucket.
    # Past _Z (more than 26 same-named clusters) fall back to numeric
    # suffixes _27.._n — char(64+n) would walk into '[', '\', ']' (ADVICE
    # r2: malformed though unique).
    w = Window.partitionBy("base").orderBy(cluster_col)
    rn = F.row_number().over(w)
    suffix = F.when(rn <= 26, F.char(F.lit(64) + rn)).otherwise(
        rn.cast("string")
    )
    return named.select(
        cluster_col,
        F.when(
            F.count("*").over(Window.partitionBy("base")) > 1,
            F.concat(F.col("base"), F.lit("_"), suffix),
        )
        .otherwise(F.col("base"))
        .alias("name"),
    )


def cluster_derived_labels(
    composition: DataFrame,
    assignments: DataFrame,
    cluster_col: str = "cluster_id",
    entity_col: str = "entity_id",
    min_fraction: float = 0.05,
    top_n: int = 3,
) -> DataFrame:
    """entity_id → cluster-derived name: per cluster rank entities by
    within-cluster fraction (ties to the smaller name), keep those with
    fraction >= min_fraction capped at top_n (single top as fallback),
    join with " / "; then map each assigned entity to its cluster's name
    (reference cluster_derived_labels_map,
    linker_cluster_training.py:153-196). `assignments` is
    (entity_id, cluster)."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("within_fraction"), entity_col
    )
    ranked = composition.withColumn("rk", F.row_number().over(w))
    passes = (F.col("within_fraction") >= min_fraction) & (F.col("rk") <= top_n)
    # clusters where nothing passes the threshold fall back to their top row
    any_pass = (
        ranked.where(passes)
        .select(cluster_col)
        .distinct()
        .withColumn("__has", F.lit(True))
    )
    kept = (
        ranked.join(any_pass, cluster_col, "left")
        .where(passes | (F.col("__has").isNull() & (F.col("rk") == 1)))
        .drop("__has")
    )
    names = kept.groupBy(cluster_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rk"), F.col(entity_col).alias("e")))
                ),
                lambda s: s["e"],
            ),
            " / ",
        ).alias("name")
    )
    return assignments.join(names, cluster_col).select(entity_col, "name")


def write_cluster_artifacts(
    labeled: DataFrame,
    root: str,
    cluster_col: str = "cluster_id",
    entity_col: str = "entity_id",
) -> dict[str, str]:
    """Assemble and write the three artifact tables (the reference's
    emergent-cluster catalog, reporting.py:447-484): composition snapshot,
    consensus names, cluster-derived labels. Returns {artifact: path}."""
    comp = cluster_composition(labeled, cluster_col, entity_col).persist()
    names = consensus_cluster_names(comp, cluster_col, entity_col)
    # provisional assignment: each entity to its modal cluster
    # (reference _modal_cluster_deterministic, ties to smallest cluster id)
    w = Window.partitionBy(entity_col).orderBy(F.desc("n"), cluster_col)
    assignments = (
        comp.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(entity_col, cluster_col)
    )
    labels = cluster_derived_labels(comp, assignments, cluster_col, entity_col)
    paths = {}
    for name, df in (
        ("composition", comp),
        ("consensus_names", names),
        ("derived_labels", labels),
    ):
        p = os.path.join(root, name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    comp.unpersist()
    return paths
