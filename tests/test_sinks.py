"""S10 extension-dispatched sinks, P7 named projections, F11 min-max."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pelinker_spark.sinks import (
    debug_projection,
    minmax_normalize,
    public_projection,
    write_by_extension,
)


def test_write_by_extension(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    assert write_by_extension(df, str(tmp_path / "out.parquet")) == "parquet"
    assert write_by_extension(df, str(tmp_path / "out.csv")) == "csv"
    assert write_by_extension(df, str(tmp_path / "out.jsonl")) == "json"
    assert write_by_extension(df, str(tmp_path / "outdir")) == "parquet"
    back = spark.read.parquet(str(tmp_path / "out.parquet"))
    assert back.count() == 2
    csv = spark.read.option("header", "true").csv(str(tmp_path / "out.csv"))
    assert set(csv.columns) == {"a", "b"}


def test_projections(spark):
    clusters = spark.createDataFrame(pd.DataFrame({
        "url": ["u"], "itext": [0], "ichunk": [1], "wg": [2],
        "mention": ["m"], "key": ["k"], "a": [0], "b": [1],
        "a_abs": [5], "b_abs": [6], "cluster_id": ["c"], "kb_entity_id": ["E1"],
    }))
    pub = public_projection(clusters)
    assert pub.columns == ["url", "mention", "key", "wg", "a_abs", "b_abs",
                           "cluster_id", "kb_entity_id"]
    dbg = debug_projection(clusters)
    assert set(dbg.columns) == set(pub.columns) | {"itext", "ichunk", "a", "b"}


def test_minmax_normalize(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "x": [2.0, 4.0, 6.0, float("nan"), None],
    }))
    out = minmax_normalize(df, "x").toPandas().sort_values("x")
    vals = dict(zip(out.x, out.x_minmax))
    assert vals[2.0] == pytest.approx(0.0)
    assert vals[4.0] == pytest.approx(0.5)
    assert vals[6.0] == pytest.approx(1.0)
    nn = out[out.x.isna()]
    assert nn.x_minmax.isna().all()
    # constant column -> 1.0 (reference _minmax_norm_per_curve)
    const = spark.createDataFrame(pd.DataFrame({"x": [3.0, 3.0]}))
    cv = minmax_normalize(const, "x").toPandas()
    assert (cv.x_minmax == 1.0).all()
