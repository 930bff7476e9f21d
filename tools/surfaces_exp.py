#!/usr/bin/env python
"""Isolate the surfaces-stage stall (wall 60s at parallelism 4.2/8).

Builds the mention cache once, then times surface_table variants:
  base     — pipeline shape: groupBy + persist(MEMORY_AND_DISK) + count
  nocache  — groupBy + count only (no persist): isolates cache-write cost
  wide     — 32 shuffle partitions for the agg: isolates reduce-task
             granularity / spill overlap
  nomin    — count-only agg (no min(mention) string agg)

Usage: python tools/surfaces_exp.py <cores> <pages_dir> [variant]

With a variant argument, runs ONLY that variant (fresh JVM per variant
avoids cross-variant shuffle-stage reuse contaminating the numbers):
  base / nocache3 / nocompress / nomin
nocache3 scans the UNCACHED surface table three times (the three
downstream branches of the real pipeline) — the DAG scheduler reuses
the groupBy's shuffle map stage across jobs, so scans 2-3 pay only the
reduce side.
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
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pelinker_spark.mentions import generate_mentions
    from pelinker_spark.pipeline import extract_stage, surface_table
    from pelinker_spark.session import get_spark
    from proc_cpu import tree_cpu_sec

    spark = get_spark(f"surfexp_{cores}", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(pages_dir)
    mentions = generate_mentions(extract_stage(pages), (1, 2, 3), "en").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = mentions.count()  # warm the cache once; excluded from timings
    out = {"cores": cores, "n_mentions": n, "variants": {}}

    def run(name, build, shuffle_parts=None):
        if shuffle_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        t0, c0 = time.monotonic(), tree_cpu_sec()
        df = build()
        k = df.count()
        wall = time.monotonic() - t0
        cpu = tree_cpu_sec() - c0
        if shuffle_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(cores))
        try:
            df.unpersist()
        except Exception:
            pass
        out["variants"][name] = {
            "rows": k,
            "wall_s": round(wall, 1),
            "cpu_s": round(cpu, 1),
            "parallelism": round(cpu / wall, 2),
        }

    which = sys.argv[3] if len(sys.argv) > 3 else "all"

    if which in ("base", "all"):
        run(
            "base",
            lambda: surface_table(mentions).persist(StorageLevel.MEMORY_AND_DISK),
        )
    if which in ("nocache3", "all"):
        for i in (1, 2, 3):
            run(f"nocache_scan{i}", lambda: surface_table(mentions))
    if which in ("nocompress", "all"):
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
        run(
            "nocompress",
            lambda: surface_table(mentions).persist(StorageLevel.MEMORY_AND_DISK),
        )
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    if which in ("nomin", "all"):
        run(
            "nomin",
            lambda: mentions.groupBy("wg", "key").agg(
                F.count("*").alias("n_mentions")
            ),
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
