#!/usr/bin/env python
"""One timed link-pipeline run at a given parallelism level, for the
N-vs-4N scaling measurement. Prints one JSON line.

Usage: python tools/scaling_run.py <cores> <pages_parquet_dir> [n_pages]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]
    # Pin the whole process tree (this driver, the JVM it spawns, every
    # Python worker) to exactly `cores` CPUs. local[N] caps TASK SLOTS
    # only — GC/JIT/daemon threads and Python workers still spill onto
    # other host CPUs, which the process-tree CPU accounting exposed:
    # a local[2] run burned >2 CPU-sec/sec (utilization 1.04), silently
    # inflating the small-N baseline and deflating measured N→4N
    # efficiency. A real N-executor cluster is hard-capped by its
    # containers; affinity is the sandbox-faithful proxy. Children
    # inherit the mask; the JVM sizes its GC/JIT pools from the
    # effective affinity, matching container behavior.
    # Measured on this host: pinning makes the 2-core half honest (util
    # 1.04 → 0.94) but the 8-core half then CANNOT MIGRATE off cores a
    # co-tenant burst lands on (274.9s wall, util 0.789, mid-run load
    # 9.45 on 8 pinned cores) — on a shared box the pinned regime
    # measures the neighbors, not the engine. Default therefore OFF:
    # unpinned numbers UNDERSTATE true capped-cluster efficiency (the
    # small-N baseline gets free uncapped CPU), i.e. the reported
    # efficiency is a conservative lower bound. Set SPARK_GRAFT_PIN=1 on
    # an idle host for the container-faithful regime.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_PIN") == "1":
        try:
            _os.sched_setaffinity(0, set(range(cores)))
        except (AttributeError, OSError):
            pass  # non-Linux fallback: run uncapped
    from pelinker_spark.pipeline import LinkConfig, link_pipeline
    from pelinker_spark.session import get_spark
    from pelinker_spark.synth import web_pages

    # Container-faithful JVM sizing (third regime, opt-in): on a real
    # cluster each executor JVM is cgroup-limited and (UseContainerSupport)
    # sizes its GC/compiler thread pools from the CONTAINER quota, not the
    # host. In this sandbox the local[N] JVM sees all 32 host CPUs, so a
    # local[2] run's GC/JIT/IO threads run uncapped beside the 2 task
    # slots — measured util ~1.04-1.07 (the run consumes ~2.2 cores),
    # inflating small-N throughput and DEFLATING measured N→4N efficiency.
    # Unlike sched_setaffinity (which pins WHICH cores and so couldn't
    # dodge co-tenant bursts), sizing the pools caps HOW MANY threads while
    # leaving the scheduler free to migrate — the honest denominator
    # without the pinning pathology. Symmetric at both levels.
    sized = _os.environ.get("SPARK_GRAFT_SIZED_JVM") == "1"
    extra = None
    if sized:
        gc_threads = max(1, cores)
        conc = max(1, cores // 4)
        extra = {
            "spark.driver.extraJavaOptions": (
                f"-XX:ActiveProcessorCount={cores} "
                f"-XX:ParallelGCThreads={gc_threads} "
                f"-XX:ConcGCThreads={conc}"
            )
        }
    spark = get_spark(
        f"scaling_{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf=extra,
    )

    # steady-state warm-up (JIT + Python UDF workers), excluded from timing
    wp = web_pages(spark, 2000, seed=7, n_entities=50, partitions=8)
    w = link_pipeline(spark, wp, cfg=LinkConfig())
    w.clusters.count()
    for df in (w.mentions, w.surfaces, w.edges):
        df.unpersist()

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()

    def _tree_cpu_sec() -> float:
        """CPU-seconds (utime+stime+reaped children) of this process tree
        — the Spark JVM and its Python workers are all descendants. Lets
        the receipt separate engine CPU from ambient co-tenant load:
        utilization = delta_cpu / (wall * cores)."""
        import os

        me = os.getpid()
        ppid: dict[int, int] = {}
        ticks: dict[int, int] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    parts = f.read().rsplit(") ", 1)[1].split()
                # after comm: fields (0-indexed from state): ppid is
                # parts[1]; utime..cstime are parts[11:15]
                ppid[int(d)] = int(parts[1])
                ticks[int(d)] = sum(int(x) for x in parts[11:15])
            except Exception:
                continue
        total = 0
        for pid, t in ticks.items():
            p = pid
            while p > 1:
                if p == me:
                    total += t
                    break
                p = ppid.get(p, 1)
        import os as _os

        return total / float(_os.sysconf("SC_CLK_TCK"))

    # mid-run load sampler: before/after 1-min loadavg misses co-tenant
    # bursts that start and decay INSIDE the run (the r3 pair spread).
    # Sampling every 10s gives a per-run pollution record: an N-core run
    # fully busy contributes ~N to loadavg, so median sample - N estimates
    # ambient load DURING the run.
    import threading

    samples: list[float] = []
    stop = threading.Event()

    def _sampler() -> None:
        while not stop.is_set():
            samples.append(float(open("/proc/loadavg").read().split()[0]))
            stop.wait(10)

    th = threading.Thread(target=_sampler, daemon=True)

    def _steal_sec() -> float:
        """Cumulative hypervisor steal time (all CPUs, seconds). loadavg
        only sees runnable tasks INSIDE this VM; on a shared hypervisor
        the host can deprive the whole VM of cycles without any loadavg
        signature. The per-run steal delta makes that pollution visible
        in the receipt."""
        parts = open("/proc/stat").readline().split()
        return int(parts[8]) / float(_os.sysconf("SC_CLK_TCK"))

    load_before = open("/proc/loadavg").read().split()[0]
    steal0 = _steal_sec()
    cpu0 = _tree_cpu_sec()
    th.start()
    t0 = time.monotonic()
    res = link_pipeline(spark, pages, cfg=LinkConfig())
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    link_sec = time.monotonic() - t0
    cpu1 = _tree_cpu_sec()
    steal1 = _steal_sec()
    stop.set()
    th.join(timeout=1)
    load_after = open("/proc/loadavg").read().split()[0]
    srt = sorted(samples) or [float(load_before)]

    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_clusters": n_clusters,
                "link_sec": round(link_sec, 2),
                "docs_per_sec": round(n_pages / link_sec, 1),
                "ambient_load_before": float(load_before),
                "ambient_load_after": float(load_after),
                "load_mid_median": round(srt[len(srt) // 2], 2),
                "load_mid_max": round(srt[-1], 2),
                "engine_cpu_sec": round(cpu1 - cpu0, 1),
                "cpu_utilization": round((cpu1 - cpu0) / (link_sec * cores), 3),
                "steal_sec": round(steal1 - steal0, 1),
                "cpus_pinned": sorted(_os.sched_getaffinity(0))
                == list(range(cores)),
                "sized_jvm": sized,
            }
        )
    )


if __name__ == "__main__":
    main()
