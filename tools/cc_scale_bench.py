#!/usr/bin/env python
"""Above-cutoff distributed CC benchmark on a constructed graph.

The real 320k-page link run yields ~213k edges — below the 1M-edge
adaptive cutoff — so tools/cc_bench.py exercises the distributed path
only by forcing driver_max_edges=0. This tool builds a graph ABOVE the
cutoff with exactly known structure (chains stress O(diameter) depth,
stars stress hub skew) entirely from spark.range column algebra
(deterministic, no driver-side data), runs BOTH paths on the same edge
table, and checks the component count against the closed-form truth.

Usage: python tools/cc_scale_bench.py <cores> [n_chains] [chain_len]
                                      [n_stars] [star_size]
Defaults: 100000 chains x 11 nodes + 20000 stars x 50 spokes
          = 1,980,000 edges, 3,120,000 nodes, 120,000 components.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    chain_len = int(sys.argv[3]) if len(sys.argv) > 3 else 11
    n_stars = int(sys.argv[4]) if len(sys.argv) > 4 else 20_000
    star_size = int(sys.argv[5]) if len(sys.argv) > 5 else 50

    from pyspark.sql import functions as F

    from pelinker_spark.cc import connected_components
    from pelinker_spark.session import get_spark

    spark = get_spark(f"ccscale_{cores}", cores=cores, shuffle_partitions=cores)

    # chains: c<i>n<j> -- c<i>n<j+1>   (diameter = chain_len - 1)
    chains = (
        spark.range(n_chains * (chain_len - 1))
        .select(
            (F.col("id") / (chain_len - 1)).cast("long").alias("c"),
            (F.col("id") % (chain_len - 1)).alias("j"),
        )
        .select(
            F.format_string("c%07dn%02d", "c", "j").alias("src"),
            F.format_string("c%07dn%02d", "c", F.col("j") + 1).alias("dst"),
        )
    )
    # stars: s<i>h -- s<i>p<j>   (hub degree = star_size)
    stars = (
        spark.range(n_stars * star_size)
        .select(
            (F.col("id") / star_size).cast("long").alias("s"),
            (F.col("id") % star_size).alias("j"),
        )
        .select(
            F.format_string("s%06dh", "s").alias("src"),
            F.format_string("s%06dp%03d", "s", "j").alias("dst"),
        )
    )
    edges = chains.unionByName(stars).persist()
    n_edges = edges.count()
    expect_components = n_chains + n_stars

    out: dict = {
        "cores": cores,
        "n_edges": n_edges,
        "n_nodes": n_chains * chain_len + n_stars * (star_size + 1),
        "expect_components": expect_components,
    }
    for label, cutoff in (("distributed", 0), ("driver", n_edges + 1)):
        la = load1()
        stats: dict = {}
        t0 = time.monotonic()
        comp = connected_components(
            edges, "src", "dst", driver_max_edges=cutoff, stats=stats
        )
        n_comp = comp.select("component").distinct().count()
        wall = time.monotonic() - t0
        assert n_comp == expect_components, (label, n_comp)
        out[label] = {
            "wall_sec": round(wall, 2),
            "iterations": stats.get("iterations"),
            "n_components": n_comp,
            "load_before": la,
            "load_after": load1(),
        }
    edges.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
