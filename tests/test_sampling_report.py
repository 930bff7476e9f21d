"""Sampling determinism + reporting operators."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pelinker_spark.report import (
    cluster_composition,
    consensus_labels,
    dedupe_overlapping_mentions,
    modal_assignment,
)
from pelinker_spark.sampling import (
    cap_per_group,
    hash_fraction_sample,
    negative_sample,
    stratified_exact_sample,
)


def _events(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 50).alias("user"),
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("etype"),
    )


def test_hash_fraction_sample_deterministic(spark):
    df = _events(spark)
    a = hash_fraction_sample(df, ["id"], 0.25)
    b = hash_fraction_sample(df.repartition(13), ["id"], 0.25)
    na, nb = a.count(), b.count()
    assert na == nb
    assert abs(na / 2000 - 0.25) < 0.05
    assert a.exceptAll(b).count() == 0  # identical rows, not just counts


def test_cap_per_group_exact_and_stable(spark):
    df = _events(spark)
    capped = cap_per_group(df, ["user"], 5, ["id"])
    sizes = capped.groupBy("user").count().toPandas()
    assert (sizes["count"] == 5).all()
    capped2 = cap_per_group(df.repartition(7), ["user"], 5, ["id"])
    assert capped.exceptAll(capped2).count() == 0


def test_stratified_exact(spark):
    df = _events(spark)
    s = stratified_exact_sample(df, "etype", {"t0": 10, "t1": 3}, ["id"])
    got = dict(s.groupBy("etype").count().collect())
    assert got == {"t0": 10, "t1": 3}


def test_negative_sample_counts_and_disjoint(spark):
    cands = _events(spark).withColumnRenamed("user", "url")
    pos = cands.where(F.col("id") % 7 == 0)
    negs = negative_sample(cands, pos, ["id"], 2.0, doc_col="url", tiebreak_cols=["id"])
    # disjoint from positives
    assert negs.join(pos, "id", "left_semi").count() == 0
    # per-doc counts == min(round(n_pos * 2), available non-positive rows)
    got = dict(negs.groupBy("url").count().collect())
    avail = dict(
        cands.join(pos, "id", "left_anti").groupBy("url").count().collect()
    )
    expect = {
        r["user"] if "user" in r else r["url"]: round(r["n"] * 2.0)
        for r in pos.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    expect = {
        k: min(v, avail.get(k, 0)) for k, v in expect.items()
    }
    assert got == {k: v for k, v in expect.items() if v > 0}


def test_composition_and_modal_and_consensus(spark):
    pdf = pd.DataFrame(
        {
            "cluster_id": ["c1"] * 6 + ["c2"] * 4,
            "key": ["a", "a", "a", "b", "b", "c", "b", "b", "b", "d"],
        }
    )
    df = spark.createDataFrame(pdf)
    comp = cluster_composition(df)
    r = {(x["cluster_id"], x["key"]): x for x in comp.collect()}
    assert r[("c1", "a")]["frac_of_cluster"] == 0.5
    assert r[("c1", "b")]["frac_of_entity"] == 0.4  # 2 of 5 b's
    modal = {x["key"]: x["modal_cluster"] for x in modal_assignment(df).collect()}
    assert modal["a"] == "c1" and modal["b"] == "c2"
    top = consensus_labels(comp, top_n=2).collect()
    c1 = [t for t in top if t["cluster_id"] == "c1"][0]["top_labels"]
    assert c1[0]["key"] == "a" and c1[0]["rank"] == 1


def test_overlap_dedup(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u"] * 4,
            "itext": [0] * 4,
            "mention": ["alpha beta", "beta", "gamma", "beta gamma"],
            "a_abs": [0, 6, 20, 6],
            "b_abs": [10, 10, 25, 16],
        }
    )
    df = spark.createDataFrame(pdf)
    out = dedupe_overlapping_mentions(df).toPandas().sort_values("a_abs")
    # [0,10) [6,10) [6,16) overlap transitively; [20,25) is alone
    comps = out.set_index("mention")["overlap_component"]
    assert comps["alpha beta"] == comps["beta"] == comps["beta gamma"]
    assert comps["gamma"] != comps["beta"]
    best = out[out.is_best].mention.tolist()
    # best in overlap group: min span length then min mention -> "beta"
    assert "beta" in best and "gamma" in best and len(best) == 2


def test_cluster_cosine_std(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    tight = rng.standard_normal(16) + 5
    rows = []
    for i in range(30):  # tight cluster: same direction + tiny noise
        rows.append({"cluster_id": "tight", "embed": (tight + 0.01 * rng.standard_normal(16)).tolist()})
    for i in range(30):  # loose cluster: random directions
        rows.append({"cluster_id": "loose", "embed": rng.standard_normal(16).tolist()})
    rows.append({"cluster_id": "single", "embed": tight.tolist()})
    df = spark.createDataFrame(pd.DataFrame(rows))

    from pelinker_spark.report import cluster_cosine_std

    out = {r["cluster_id"]: r for r in cluster_cosine_std(df, vec_col="embed").collect()}
    assert out["tight"]["cos_mean"] > 0.99 and out["tight"]["cos_std"] < 0.01
    assert out["loose"]["cos_std"] > out["tight"]["cos_std"]
    assert out["single"]["cos_std"] is None and out["single"]["n"] == 1
