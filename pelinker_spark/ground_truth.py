"""Ground-truth ingestion: the reference's GT JSON format → evaluation
tables (reference README.md:33-39; data/ground_truth/sample.0.gt.json
shape: {"text": str, "ground_truth": [{itext, a, b, entity_id}, ...]}).

The loader emits (pages, gold) frames wired for metrics.span_accuracy and
pipeline.evaluate_against_gold: gold surfaces are sliced from the raw text
by the GT char spans; blocking keys derive from the same textnorm rules as
the pipeline (single source of truth)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .textnorm import blocking_key, tokenize

GT_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

GT_GOLD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("itext", T.LongType(), False),
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("gold_key", T.StringType(), True),
    ]
)


def load_ground_truth_json(
    spark: SparkSession, paths: list[str], lang: str = "en"
) -> tuple[DataFrame, DataFrame]:
    """Read one or more GT JSON documents → (pages, gold). Each file
    becomes one page row (url = gt://<path>); each ground_truth hit
    becomes a gold row with the surface sliced from the raw text and the
    pipeline's blocking key. GT files are small labeled samples (the
    reference ships single-document JSONs), so a driver-side read is the
    right scale call; corpus-sized gold lives in parquet instead."""
    page_rows = []
    gold_rows = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        url = f"gt://{p}"
        text = doc["text"]
        page_rows.append({"url": url, "text": text, "lang": lang})
        for hit in doc.get("ground_truth", []):
            a, b = int(hit["a"]), int(hit["b"])
            surface = text[a:b]
            gold_rows.append(
                {
                    "url": url,
                    "itext": int(hit.get("itext", 0)),
                    "a": a,
                    "b": b,
                    "entity_id": str(hit["entity_id"]),
                    "surface": surface,
                    "gold_key": blocking_key(tokenize(surface)),
                }
            )
    pages = spark.createDataFrame(page_rows, GT_PAGE_SCHEMA)
    gold = spark.createDataFrame(gold_rows, GT_GOLD_SCHEMA)
    return pages, gold
