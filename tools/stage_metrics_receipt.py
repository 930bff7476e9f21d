#!/usr/bin/env python
"""One checkpointed link run, then the per-stage (n_rows, wall_ms) table
from CheckpointManager.metrics() — the BASELINE.md:33 receipt: per-stage
row counts and wall-clock from the checkpoint metrics table.

Usage: python tools/stage_metrics_receipt.py <cores> <pages_parquet_dir>
Prints one JSON line with the per-stage table + total wall.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]
    from pyspark.sql import functions as F

    from pelinker_spark.pipeline import LinkConfig, link_pipeline
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    spark = get_spark(f"stage_metrics_{cores}", cores=cores, shuffle_partitions=cores)

    # steady-state warm-up (JIT + Python UDF workers), excluded from timing
    wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
    w = link_pipeline(spark, wp, cfg=LinkConfig())
    w.clusters.count()
    w.unpersist()

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    ckpt_dir = tempfile.mkdtemp(prefix="pel_ckpt_receipt_")

    load_before = open("/proc/loadavg").read().split()[0]
    t0 = time.monotonic()
    res = link_pipeline(spark, pages, cfg=LinkConfig(), checkpoint_dir=ckpt_dir)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    link_sec = time.monotonic() - t0
    load_after = open("/proc/loadavg").read().split()[0]

    from pelinker_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, ckpt_dir, LinkConfig().as_dict(), input_df=pages)
    stage_rows = (
        mgr.metrics()
        .groupBy("stage")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.max("wall_ms").alias("wall_ms"),
            F.count("*").alias("n_partitions"),
        )
        .collect()
    )
    order = ["extract", "mentions", "surfaces", "pairs", "edges", "components", "clusters"]
    table = sorted(
        ([r["stage"], r["n_rows"], r["wall_ms"], r["n_partitions"]] for r in stage_rows),
        key=lambda t: order.index(t[0]) if t[0] in order else 99,
    )
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_clusters": n_clusters,
                "link_sec_checkpointed": round(link_sec, 2),
                "ambient_load_before": float(load_before),
                "ambient_load_after": float(load_after),
                "stages": [
                    {"stage": s, "n_rows": n, "wall_ms": w, "n_partitions": p}
                    for s, n, w, p in table
                ],
            }
        )
    )
    shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
