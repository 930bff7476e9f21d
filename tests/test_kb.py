from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark.kb import (
    fuzzy_match_col,
    fuzzy_match_extract,
    override_join,
    preprocess_kb,
)
from pelinker_spark.synth import kb_table


def test_preprocess_kb(spark):
    kb = kb_table(spark, 60)
    out = preprocess_kb(kb)
    n_in, n_out = kb.count(), out.count()
    assert 0 < n_out < n_in  # nulls and "(inverse)" rows dropped
    rows = out.collect()
    assert all(r["description"] is not None for r in rows)
    assert all("inverse" not in r["description"].lower() for r in rows)
    ids = [r["entity_id"] for r in rows]
    assert ids == sorted(ids)


def test_fuzzy_match(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the protein strongly activates the receptor complex",
                    "activation of some unrelated receptors",
                    "nothing relevant here at all",
                ]
            }
        )
    )
    hit = df.select(
        fuzzy_match_col(F.col("text"), "strongly activate").alias("m"),
        fuzzy_match_extract(F.col("text"), "activates receptor").alias("e"),
    ).collect()
    assert hit[0]["m"] is True  # "strongly activates" matches stem+gap
    assert "activates the receptor" in hit[0]["e"]  # gap bridges "the"
    assert hit[2]["m"] is False and hit[2]["e"] == ""


def test_override_join(spark):
    full = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "lbl": ["a", "b", "c"]})
    )
    fit = spark.createDataFrame(pd.DataFrame({"id": [2], "lbl": ["B"]}))
    out = {r["id"]: r["lbl"] for r in override_join(full, fit, "id", "lbl").collect()}
    assert out == {1: "a", 2: "B", 3: "c"}
