#!/usr/bin/env python
"""Per-stage wall-clock profile of the link pipeline at a given core count.

Usage: python tools/stage_profile.py <cores> <pages_parquet_dir>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]
    from pyspark.sql import functions as F

    from pelinker_spark.blocking import compact_key_pairs, lsh_candidate_pairs
    from pelinker_spark.cc import connected_components
    from pelinker_spark.mentions import generate_mentions
    from pelinker_spark.pipeline import (
        LinkConfig,
        extract_stage,
        link_pipeline,
        score_pairs,
        surface_table,
    )
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    spark = get_spark(f"stageprof_{cores}", cores=cores, shuffle_partitions=cores)
    cfg = LinkConfig()

    wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
    w = link_pipeline(spark, wp, cfg=cfg)
    w.clusters.count()
    for df in (w.mentions, w.surfaces, w.edges):
        df.unpersist()

    from proc_cpu import tree_cpu_sec

    pages = spark.read.parquet(pages_dir)
    t: dict[str, float] = {}
    c: dict[str, float] = {}
    T0 = time.monotonic()
    C0 = tree_cpu_sec()

    def tick(name, df):
        t0, c0 = time.monotonic(), tree_cpu_sec()
        df = df.persist()
        n = df.count()
        t[name] = round(time.monotonic() - t0, 1)
        c[name] = round(tree_cpu_sec() - c0, 1)
        return df, n

    docs, _ = tick("extract", extract_stage(pages))
    mentions, nm = tick("mentions", generate_mentions(docs, (1, 2, 3), "en"))
    surfaces, ns = tick("surfaces", surface_table(mentions))
    from pelinker_spark.pipeline import prefilter_pairs

    from pelinker_spark.blocking import has_nonkey_chars

    linkable = surfaces
    if cfg.lsh_min_mentions > 1:
        # translate-gated, same as the pipeline — the rlike form measured
        # ~38s at 12.5M surfaces/8c and misattributed it to pair cost
        linkable = surfaces.where(
            (F.col("n_mentions") >= cfg.lsh_min_mentions)
            | has_nonkey_chars(F.col("key"))
        )
    # sub-ticks inside pair generation (each materialized separately, so
    # the per-substage walls overlap the combined "pairs" number of the
    # coarse profile but localize the cost)
    from pelinker_spark.blocking import lsh_buckets

    linkable, nl = tick("pairs/linkable", linkable)
    buckets, nb = tick(
        "pairs/lsh_buckets",
        lsh_buckets(
            linkable, "key", cfg.lsh_num_hashes, cfg.lsh_bands, cfg.lsh_rows
        ),
    )
    lshp, nlp = tick(
        "pairs/lsh_pairs",
        lsh_candidate_pairs(
            linkable,
            num_hashes=cfg.lsh_num_hashes,
            bands=cfg.lsh_bands,
            rows=cfg.lsh_rows,
            max_block=cfg.max_block,
        ),
    )
    compp, ncp = tick(
        "pairs/compact_pairs",
        compact_key_pairs(surfaces, max_block=cfg.compact_max_block),
    )
    pairs, np_ = tick(
        "pairs",
        prefilter_pairs(lshp.unionByName(compp)).dropDuplicates(
            ["key_a", "key_b"]
        ),
    )
    rows_sub = {
        "linkable": nl, "bucket_rows": nb, "lsh_pairs": nlp,
        "compact_pairs": ncp,
    }
    scored, _ = tick("scored", score_pairs(pairs, cfg))
    edges, ne = tick(
        "edges",
        scored.where(F.col("cos") >= cfg.cos_threshold).select("key_a", "key_b"),
    )
    t0, c0 = time.monotonic(), tree_cpu_sec()
    comp = connected_components(edges, "key_a", "key_b")
    full = (
        surfaces.select("key")
        .join(comp, "key", "left")
        .select("key", F.coalesce("component", F.col("key")).alias("component"))
    )
    clusters = mentions.join(full, "key")
    nc = clusters.count()
    t["cc+clusters"] = round(time.monotonic() - t0, 1)
    c["cc+clusters"] = round(tree_cpu_sec() - c0, 1)
    t["TOTAL"] = round(time.monotonic() - T0, 1)
    c["TOTAL"] = round(tree_cpu_sec() - C0, 1)
    print(json.dumps({"cores": cores, "stages": t, "cpu": c, "rows": {"mentions": nm, "surfaces": ns, "pairs": np_, "edges": ne, "clusters": nc}, "rows_sub": rows_sub}))


if __name__ == "__main__":
    main()
