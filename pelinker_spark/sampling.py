"""Deterministic sampling operators.

The reference samples with seeded RandomState (negative sampling
util.py:1055-1109, stratified selection sampling.py:28-98, per-entity caps
sampling.py:101-153). Seeded RNG is only partition-stable if partitioning
is stable, so here every sampling decision derives from a content hash
(xxhash64 / md5) instead — byte-identical output at any parallelism
(SURVEY.md §7.3.2). All pure column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~fraction of rows, decided by md5(key||salt) — deterministic,
    partition-independent, and oracle-expressible (md5 is identical in
    every engine). Analog of df.sample() without RNG state."""
    thresh = int(fraction * 0xFFFF)
    h = F.md5(F.concat_ws("-", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]))
    return df.where(F.conv(F.substring(h, 1, 4), 16, 10).cast("long") < thresh)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    tiebreak_cols: list[str],
    salt: str = "cap",
) -> DataFrame:
    """Per-group deterministic cap of k rows, chosen by hash order
    (reference cap_mentions_per_entity pelinker/sampling.py:101-153: seeded
    random key + stable sort + head(k), re-expressed partition-stable)."""
    order = F.xxhash64(
        F.concat_ws("-", F.lit(salt), *[F.col(c).cast("string") for c in tiebreak_cols])
    )
    w = Window.partitionBy(*group_cols).orderBy(order, *tiebreak_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_exact_sample(
    df: DataFrame,
    stratum_col: str,
    per_stratum: dict[str, int],
    tiebreak_cols: list[str],
    salt: str = "strat",
) -> DataFrame:
    """Exactly n rows per stratum (reference stratified_mention_sample
    pelinker/sampling.py:28-98: exact allocation, not sampleBy's
    approximate fractions), chosen by hash order."""
    order = F.xxhash64(
        F.concat_ws("-", F.lit(salt), *[F.col(c).cast("string") for c in tiebreak_cols])
    )
    w = Window.partitionBy(stratum_col).orderBy(order, *tiebreak_cols)
    quota = F.create_map(
        *[F.lit(x) for kv in per_stratum.items() for x in kv]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.coalesce(quota[F.col(stratum_col)], F.lit(0)))
        .drop("__rn")
    )


def negative_sample(
    candidates: DataFrame,
    positives: DataFrame,
    join_cols: list[str],
    ratio_per_positive: float,
    doc_col: str = "url",
    tiebreak_cols: list[str] | None = None,
    salt: str = "neg",
) -> DataFrame:
    """Per-document negative sampling (reference util.py:1055-1109):
    candidates minus positives (anti join on join_cols), then per document
    keep round(n_positives * ratio) rows by hash order — exact counts,
    partition-stable, no replacement."""
    tiebreak_cols = tiebreak_cols or join_cols
    negs = candidates.join(positives.select(join_cols).distinct(), join_cols, "left_anti")
    n_pos = positives.groupBy(doc_col).agg(F.count("*").alias("__npos"))
    order = F.xxhash64(
        F.concat_ws("-", F.lit(salt), *[F.col(c).cast("string") for c in tiebreak_cols])
    )
    w = Window.partitionBy(doc_col).orderBy(order, *tiebreak_cols)
    return (
        negs.join(n_pos, doc_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.round(F.col("__npos") * F.lit(ratio_per_positive)))
        .drop("__rn", "__npos")
    )
