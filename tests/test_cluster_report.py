"""Cluster-composition snapshot artifacts vs hand-computed reference
semantics (linker_cluster_training.py:23-196)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pelinker_spark.cluster_report import (
    cluster_composition,
    cluster_derived_labels,
    consensus_cluster_names,
    write_cluster_artifacts,
)


def _labeled(spark):
    rows = (
        [("c1", "kinase")] * 6 + [("c1", "ligase")] * 2          # dominant
        + [("c2", "receptor")] * 3 + [("c2", "channel")] * 3     # near-uniform
        + [("c3", "enzyme")] * 4                                  # single
        + [("c4", "alpha")] * 5 + [("c4", "beta")] * 3
        + [("c4", "gamma")] * 2                                   # mixed, no dominant
        + [("c5", "enzyme")] * 2                                  # name collision w/ c3
    )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["cluster_id", "entity_id"])
    )


def test_cluster_composition_fractions(spark):
    comp = cluster_composition(_labeled(spark)).toPandas()
    c1 = comp[comp.cluster_id == "c1"].set_index("entity_id")
    assert c1.loc["kinase", "within_fraction"] == pytest.approx(6 / 8)
    assert c1.loc["ligase", "within_fraction"] == pytest.approx(2 / 8)
    # enzyme appears in c3 (4) and c5 (2): capture = n / global entity mass
    enz = comp[comp.entity_id == "enzyme"].set_index("cluster_id")
    assert enz.loc["c3", "capture_fraction"] == pytest.approx(4 / 6)
    assert enz.loc["c5", "capture_fraction"] == pytest.approx(2 / 6)


def test_consensus_names_reference_rules(spark):
    comp = cluster_composition(_labeled(spark))
    names = {
        r["cluster_id"]: r["name"]
        for r in consensus_cluster_names(comp).collect()
    }
    # dominant: kinase 0.75 >= 0.52 with gap 0.5 >= 0.12
    assert names["c1"] == "kinase"
    # near-uniform 0.5/0.5 (width 0 <= min(0.15, 0.25)) -> hyphen join
    assert names["c2"] == "channel-receptor"
    # mixed, no dominant (0.5 share < 0.52) and not uniform -> hyphen join
    assert names["c4"] == "alpha-beta-gamma"
    # single-entity clusters c3/c5 both want "enzyme" -> _A/_B by cluster id
    assert names["c3"] == "enzyme_A"
    assert names["c5"] == "enzyme_B"


def test_consensus_names_past_26_duplicates(spark):
    """More than 26 same-named clusters: suffixes stay well-formed
    (A..Z then numeric 27, 28, ... — ADVICE r2: char(64+n) walked into
    '[' '\\\\' ']')."""
    rows = [(f"c{i:02d}", "enzyme") for i in range(30)]
    comp = cluster_composition(
        spark.createDataFrame(pd.DataFrame(rows, columns=["cluster_id", "entity_id"]))
    )
    names = [r["name"] for r in consensus_cluster_names(comp).collect()]
    assert len(set(names)) == 30
    assert "enzyme_A" in names and "enzyme_Z" in names
    assert "enzyme_27" in names and "enzyme_30" in names
    assert not any(c in n for n in names for c in "[]\\^_`"[:4])


def test_cluster_derived_labels_threshold_and_fallback(spark):
    comp = cluster_composition(_labeled(spark))
    assignments = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["kinase", "ligase", "receptor", "gamma"],
        "cluster_id": ["c1", "c1", "c2", "c4"],
    }))
    labels = {
        r["entity_id"]: r["name"]
        for r in cluster_derived_labels(
            comp, assignments, min_fraction=0.3, top_n=3
        ).collect()
    }
    # c1: kinase (0.75) passes, ligase (0.25) below 0.3 -> name "kinase"
    assert labels["kinase"] == "kinase"
    assert labels["ligase"] == "kinase"
    # c2: both at 0.5 pass; rank order desc fraction, ties by name
    assert labels["receptor"] == "channel / receptor"
    # c4: alpha 0.5 passes, beta 0.3 passes, gamma 0.2 below
    assert labels["gamma"] == "alpha / beta"
    # fallback: nothing passes an impossible threshold -> single top entity
    fb = {
        r["entity_id"]: r["name"]
        for r in cluster_derived_labels(
            comp, assignments, min_fraction=0.99, top_n=3
        ).collect()
    }
    assert fb["kinase"] == "kinase"
    assert fb["receptor"] == "channel"  # tie at 0.5, smaller name wins


def test_write_cluster_artifacts(spark, tmp_path):
    paths = write_cluster_artifacts(_labeled(spark), str(tmp_path / "art"))
    assert set(paths) == {"composition", "consensus_names", "derived_labels"}
    for p in paths.values():
        df = spark.read.parquet(p)
        assert df.count() > 0
    names = spark.read.parquet(paths["consensus_names"])
    assert names.where(F.col("name") == "kinase").count() == 1
