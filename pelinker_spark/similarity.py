"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact; the oracle-checked form is
operators/relational.py q18). Scale path: random-hyperplane LSH buckets —
sign bits of deterministic hash-derived hyperplanes — so candidate
generation touches only same-bucket vectors, then exact re-scoring.
Hyperplanes derive from md5-seeded numpy (broadcast as literal arrays);
no RNG state, no fit step.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(dim: int, n_planes: int, salt: str = "ann") -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(f"{salt}:{dim}:{n_planes}".encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _dot_lit(vec_col, weights: np.ndarray):
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec_col, w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def hyperplane_bucket(vec_col, dim: int, n_planes: int = 8, salt: str = "ann"):
    """Column: LSH bucket id = sign bits of n_planes hash-derived
    hyperplane projections — pure column algebra."""
    planes = _hyperplanes(dim, n_planes, salt)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        bucket = bucket + F.when(_dot_lit(vec_col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _norm_col(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda v: v * v), F.lit(0.0), lambda a, v: a + v
        )
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast-join the (small) query set against
    every candidate, score with zip_with column algebra, window top-k.
    Returns (qid, cid, cos_sim, rn)."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        _norm_col(F.col(vec_col)).alias("qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        _norm_col(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("cid"))
        .withColumn(
            "cos_sim",
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / (F.col("qn") * F.col("cn")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "cid", "cos_sim", "rn")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: multi-table random-hyperplane LSH. Candidates sharing any
    table's bucket with the query are exactly re-scored; top-k per query.
    Recall rises with n_tables, candidate count falls with n_planes."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        _norm_col(F.col(vec_col)).alias("qn"),
        *[
            hyperplane_bucket(F.col(vec_col), dim, n_planes, f"t{t}").alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    c = candidates.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        _norm_col(F.col(vec_col)).alias("cn"),
        *[
            hyperplane_bucket(F.col(vec_col), dim, n_planes, f"t{t}").alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    cand = None
    for t in range(n_tables):
        p = c.join(
            F.broadcast(q.select("qid", "qv", "qn", F.col(f"b{t}").alias("bk"))),
            c[f"b{t}"] == F.col("bk"),
        ).select("qid", "qv", "qn", "cid", "cv", "cn")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["qid", "cid"]).where(F.col("qid") != F.col("cid"))
    scored = cand.withColumn(
        "cos_sim",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / (F.col("qn") * F.col("cn")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "cid", "cos_sim", "rn")
    )
