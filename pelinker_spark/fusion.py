"""Multi-source embedding fusion (SURVEY.md §2 J2/J3).

Reference semantics (pelinker/embedding_fusion.py):
  - dedupe_mean_embed_by_keys (:165-186): rows sharing the join keys
    collapse to the element-wise mean of their embed vectors; provenance
    columns keep the first non-null value per group.
  - mention_level_concat_frames (:189-233): per-source dedupe first, then
    INNER join across sources on (pmid→url, entity, mention) and set embed
    to the concatenation of per-source vectors in source order.
  - fused_property_vectors_from_paths (:425-469): the entity-level variant
    — per-source per-entity means, intersect entities, concatenate.

Spark-first shape: one groupBy per source (the dedupe), then equi joins on
the fusion keys — Catalyst broadcasts the smaller sources; at 10^12 rows
all sources shuffle on the same key so AQE co-partitions the join chain.
Element-wise array math is zip_with/transform column algebra, no Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_FUSION_KEYS = ("url", "entity", "mention")


def mean_embed_agg(embed_col: str = "embed"):
    """Aggregate expressions for the element-wise mean of an array column:
    returns (sum_expr, count_expr); divide after the agg with
    `divide_embed_sum`. Null/absent vectors are ignored."""
    summed = F.aggregate(
        F.collect_list(embed_col),
        F.lit(None).cast("array<double>"),
        lambda acc, v: F.when(acc.isNull(), v.cast("array<double>")).otherwise(
            F.zip_with(acc, v.cast("array<double>"), lambda x, y: x + y)
        ),
    )
    return summed, F.count(embed_col)


def dedupe_mean_embed(
    df: DataFrame,
    keys: tuple[str, ...] = MENTION_FUSION_KEYS,
    embed_col: str = "embed",
    provenance: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse duplicate key rows to the element-wise mean embed
    (reference dedupe_mean_embed_by_keys, embedding_fusion.py:165-186);
    provenance columns keep the first non-null value per group."""
    summed, cnt = mean_embed_agg(embed_col)
    aggs = [summed.alias("__sum"), cnt.alias("__n")]
    aggs += [F.first(c, ignorenulls=True).alias(c) for c in provenance]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        *keys,
        *provenance,
        F.transform("__sum", lambda x: x / F.col("__n")).alias(embed_col),
    )


def fuse_mention_frames(
    dfs: list[DataFrame],
    keys: tuple[str, ...] = MENTION_FUSION_KEYS,
    embed_col: str = "embed",
    provenance: tuple[str, ...] = (),
) -> DataFrame:
    """J2: inner-join mention rows across sources; embed becomes the
    concatenation of per-source vectors in `dfs` order (reference
    mention_level_concat_frames, embedding_fusion.py:189-233). Duplicate
    keys within a single source are averaged BEFORE the join (dedupe-
    before-join, :205-211). Provenance columns are taken from dfs[0]."""
    if not dfs:
        raise ValueError("fuse_mention_frames requires at least one frame")
    prepared = []
    for i, df in enumerate(dfs):
        missing = [c for c in (*keys, embed_col) if c not in df.columns]
        if missing:
            raise ValueError(f"Frame {i} missing columns: {sorted(missing)}")
        sub = dedupe_mean_embed(
            df, keys, embed_col, provenance if i == 0 else ()
        )
        prepared.append(sub.withColumnRenamed(embed_col, f"__e{i}"))

    out = reduce(lambda a, b: a.join(b, list(keys), "inner"), prepared)
    emb_cols = [F.col(f"__e{i}") for i in range(len(dfs))]
    return out.select(
        *keys, *provenance, F.concat(*emb_cols).alias(embed_col)
    )


def fuse_entity_vectors(
    dfs: list[DataFrame],
    entity_col: str = "entity",
    embed_col: str = "embed",
) -> DataFrame:
    """J3: entity-level fusion — per-source per-entity element-wise means,
    entity INTERSECTION across sources, concatenated in source order
    (reference fused_property_vectors_from_paths,
    embedding_fusion.py:425-469)."""
    return fuse_mention_frames(dfs, keys=(entity_col,), embed_col=embed_col)
