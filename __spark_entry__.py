"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship record-linkage run — documents corpus at sf0.001 →
mention generation → surface blocking → LSH candidates → JW/cosine scored
edges → hash-min connected components → cluster summary.

queries()/oracle_sql(): operator suite from SURVEY.md §2 over the driver's
testdata tables, each checked against a DuckDB oracle (see
pelinker_spark/operators/relational.py for the determinism discipline).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline over the sf0.001 documents corpus;
    returns one row per cluster with mass and representative surface."""
    from pelinker_spark.pipeline import LinkConfig, link_pipeline

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.col("text"),
            F.col("lang"),
        )
    )
    res = link_pipeline(spark, docs, kb=None, cfg=LinkConfig(lang="en"))
    return (
        res.clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("key").alias("n_surfaces"),
            F.min("mention").alias("representative"),
        )
        .orderBy(F.desc("n_mentions"), "cluster_id")
        .limit(100)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pelinker_spark.operators.relational import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pelinker_spark.operators.relational import ORACLES

    return dict(ORACLES)
