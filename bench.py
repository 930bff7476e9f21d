#!/usr/bin/env python
"""Per-round benchmark: headline operator queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) plus the flagship record-linkage pipeline over a
deterministic synthetic web-page table.

Prints ONE JSON line:
  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "linked_docs_per_sec": N, "link_pages": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_LINK_PAGES = int(os.environ.get("SPARK_GRAFT_LINK_PAGES", "40000"))

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
    # the pairwise JW scorer (gate + vectorized exact kernel) over ~400k
    # blocked document-prefix pairs at sf0.1 — the per-round signal for
    # the scoring hot path (round 4)
    "q39_jw_pair_scores",
]


def _load1() -> float:
    """1-minute loadavg — recorded around each timed section so a
    co-tenant burst on this shared host is distinguishable from an engine
    regression (VERDICT r2 #5; the scaling_collect discipline)."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except OSError:
        return float("nan")


def main() -> None:
    from pelinker_spark.operators.relational import QUERIES
    from pelinker_spark.pipeline import LinkConfig, link_pipeline
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    loads: dict[str, list[float]] = {}

    # warm the JVM/Arrow paths once so per-query numbers measure the plan,
    # not first-call initialization
    spark.range(1000).selectExpr("sum(id)").collect()
    # ... and the parquet footers/codec paths of every table the headline
    # queries scan — otherwise the FIRST two timed queries absorb the
    # session's one-time footer reads and JIT of the scan operators
    # (measured ~1s+ each on q01/q02 at sf0.1), which is warm-up, not plan
    # cost. A limit(1) per table reads footers + one row group.
    t0 = time.monotonic()
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").limit(1).count()
        except Exception:
            pass  # absent table: the query that needs it will fail loudly
    timings["warmup_scans"] = round(time.monotonic() - t0, 3)

    l0 = _load1()
    for name in HEADLINE:
        t0 = time.monotonic()
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        assert n >= 0
    loads["queries"] = [l0, _load1()]

    # flagship link pipeline on deterministic synthetic pages. The input is
    # materialized to parquet first (production input is a table on disk);
    # synth time is reported separately and excluded from link throughput.
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="pel_bench_")
    try:
        t0 = time.monotonic()
        web_pages(
            spark, N_LINK_PAGES, seed=42, n_entities=200, partitions=CPUS * 2
        ).write.mode("overwrite").parquet(f"{tmp}/pages")
        timings["synth_pages"] = round(time.monotonic() - t0, 3)

        # steady-state warm-up: a small full-pipeline pass JIT-compiles the
        # generated code and starts the Python UDF workers; reported
        # separately, excluded from throughput
        t0 = time.monotonic()
        wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
        w = link_pipeline(spark, wp, cfg=LinkConfig())
        w.clusters.count()
        for df in (w.mentions, w.surfaces, w.edges):
            df.unpersist()
        timings["warmup_2k"] = round(time.monotonic() - t0, 3)

        pages = spark.read.parquet(f"{tmp}/pages")
        # two timed runs, min reported: this host is shared and a co-tenant
        # burst mid-run can double a wall time (observed 152s vs 30s for
        # identical work); min-of-2 measures the engine, not the neighbors
        link_runs = []
        for i in range(2):
            la = _load1()
            t0 = time.monotonic()
            res = link_pipeline(spark, pages, cfg=LinkConfig())
            n_clusters = res.clusters.select("cluster_id").distinct().count()
            link_runs.append(round(time.monotonic() - t0, 3))
            loads[f"link_run{i + 1}"] = [la, _load1()]
            res.unpersist()
            assert n_clusters > 0
        link_sec = min(link_runs)
        timings["link_pipeline"] = round(link_sec, 3)
        timings["link_pipeline_run2"] = max(link_runs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "linked_docs_per_sec": round(N_LINK_PAGES / link_sec, 1),
                "link_pages": N_LINK_PAGES,
                "cpus": CPUS,
                "loadavg1": loads,
            }
        )
    )


if __name__ == "__main__":
    main()
