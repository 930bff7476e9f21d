#!/usr/bin/env python
"""End-to-end link run with the DISTRIBUTED connected-components path
forced (cc_driver_max_edges=0) — VERDICT r3 #6: the cc_bench receipts
exercised the exported edge table standalone; this runs the WHOLE
pipeline through hash-min + pointer doubling and must report the same
cluster count as the driver-path runs (12,355,280 at 320k pages).

Usage: python tools/cc_full_pipeline_bench.py <cores> <pages_parquet_dir>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]
    from pelinker_spark.pipeline import LinkConfig, link_pipeline
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    spark = get_spark(f"cc_full_{cores}", cores=cores, shuffle_partitions=cores)

    wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
    w = link_pipeline(spark, wp, cfg=LinkConfig())
    w.clusters.count()
    w.unpersist()

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()

    load_before = open("/proc/loadavg").read().split()[0]
    t0 = time.monotonic()
    res = link_pipeline(
        spark, pages, cfg=LinkConfig(cc_driver_max_edges=0)
    )
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    link_sec = time.monotonic() - t0
    load_after = open("/proc/loadavg").read().split()[0]

    print(
        json.dumps(
            {
                "cores": cores,
                "cc_path": "distributed (forced, cc_driver_max_edges=0)",
                "n_pages": n_pages,
                "n_clusters": n_clusters,
                "link_sec": round(link_sec, 2),
                "docs_per_sec": round(n_pages / link_sec, 1),
                "ambient_load_before": float(load_before),
                "ambient_load_after": float(load_after),
            }
        )
    )


if __name__ == "__main__":
    main()
