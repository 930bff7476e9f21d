#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1.4): times each headline
query in isolation with the noop sink (so the computation is measured, not
the sink or the count()-pruned plan), labels jobs, and optionally repeats.

NOT the driver's bench — bench.py stays frozen. This file exists so
OPTIMIZATION_r06.md can cite noop-isolated per-query numbers.

Usage:
  python bench_extra.py [query ...]          # default: all headline queries
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_topk",
    "q04_topk_per_group",
    "q05_modal_event_type",
    "q09_interval_overlap",
    "q12_embed_centroids",
    "q15_deterministic_sample",
    "q17_token_jaccard",
    "q18_cosine_topk",
    "q22_minhash_signatures",
    "q39_jw_pair_scores",
]


def _load1() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return float("nan")


def main() -> None:
    from pelinker_spark.operators.relational import QUERIES
    from pelinker_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").limit(1).count()
        except Exception:
            pass

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for r in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} (noop, rep {r})")
            t0 = time.monotonic()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"noop_sec": samples, "min": min(samples)}
        print(f"{name}: {samples} load1={_load1()}", flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
