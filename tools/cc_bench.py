#!/usr/bin/env python
"""Driver-vs-distributed connected-components comparison on the REAL edge
table of a link run (VERDICT r2 #1: exercise the distributed CC path at
bench scale).

Builds the pipeline's scored edge table once, then times
connected_components on the SAME edges via (a) the driver union-find path
and (b) the distributed hash-min + pointer-doubling path
(driver_max_edges=0), asserting identical component partitions
(count + per-component checksum). Prints one JSON line.

Usage: python tools/cc_bench.py <cores> <pages_parquet_dir>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]
    from pyspark.sql import functions as F

    from pelinker_spark.cc import connected_components
    from pelinker_spark.pipeline import LinkConfig, link_pipeline
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    spark = get_spark(f"ccbench_{cores}", cores=cores, shuffle_partitions=cores)

    # warm-up (JIT + UDF workers), excluded from timing
    wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
    w = link_pipeline(spark, wp, cfg=LinkConfig())
    w.clusters.count()
    w.unpersist()

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    res = link_pipeline(spark, pages, cfg=LinkConfig())
    n_edges = res.edges.count()  # edge cache is hot: CC timing is CC only

    def checksum(comp):
        # partition-identity checksum: sum of 31-bit row hashes of
        # (key, component) — order/partitioning independent, and 2^31 x
        # row-count stays far under int64 (ANSI mode throws on overflow)
        h31 = F.shiftrightunsigned(F.xxhash64("key", "component"), 33)
        return comp.agg(
            F.sum(h31).alias("s"),
            F.count("*").alias("n"),
            F.countDistinct("component").alias("c"),
        ).collect()[0]

    out: dict = {"cores": cores, "n_pages": n_pages, "n_edges": n_edges}
    sums = {}
    for name, dme in (("driver", 1_000_000_000), ("distributed", 0)):
        stats: dict = {}
        lb = load1()
        t0 = time.monotonic()
        comp = connected_components(
            res.edges, "key_a", "key_b", driver_max_edges=dme, stats=stats
        )
        cs = checksum(comp)
        wall = time.monotonic() - t0
        sums[name] = (cs["s"], cs["n"], cs["c"])
        out[name] = {
            "wall_sec": round(wall, 2),
            "iterations": stats.get("iterations"),
            "n_keys": cs["n"],
            "n_components": cs["c"],
            "load_before": lb,
            "load_after": load1(),
        }
    out["identical_partitions"] = sums["driver"] == sums["distributed"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
