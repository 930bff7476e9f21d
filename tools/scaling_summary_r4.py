#!/usr/bin/env python
"""Round-4 scaling summary: classify runs by mid-run evidence, compute
per-level minima over clean runs, pair efficiencies (chronologically
adjacent 2c/8c runs), and the CPU-accounting decomposition.

A run is CLEAN when every pollution signal present says quiet:
  - load_mid_max - cores <= 2.2 (ambient during the run, own load removed)
  - engine_cpu_sec within 12% of the per-level clean-run minimum
    (memory-bandwidth contention inflates OUR CPU even at low loadavg —
    the strongest pollution tell this host offers)
Runs predating the samplers are judged on before/after loadavg alone
(the r3 discipline) and marked "legacy".

Usage: python tools/scaling_summary_r4.py runs.jsonl [runs2.jsonl ...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    if not any(
                        r is not o and r == o for o in runs
                    ):  # collector double-prints are not double-written;
                        runs.append(r)
    # de-dup exact duplicates while keeping order
    seen, uniq = set(), []
    for r in runs:
        k = json.dumps(r, sort_keys=True)
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    runs = uniq

    cpu_floor = {}
    for c in (2, 8):
        for sized in (False, True):
            xs = [
                r["engine_cpu_sec"]
                for r in runs
                if r["cores"] == c
                and "engine_cpu_sec" in r
                and r.get("cpus_pinned") is not True  # pinned runs spill less
                and bool(r.get("sized_jvm")) == sized
            ]
            cpu_floor[(c, sized)] = min(xs) if xs else None

    def classify(r) -> str:
        c = r["cores"]
        pre = "sized-" if r.get("sized_jvm") else ""
        if r.get("cpus_pinned") is True:
            return "pinned-experiment"
        if "load_mid_max" not in r:
            ok = r["ambient_load_before"] <= 3.0 and r["ambient_load_after"] <= c + 2.2
            return "legacy-clean" if ok else "legacy-polluted"
        if r["load_mid_max"] - c > 2.2:
            return pre + "polluted(load)"
        floor = cpu_floor[(c, bool(r.get("sized_jvm")))]
        if (
            "engine_cpu_sec" in r
            and floor
            and r["engine_cpu_sec"] > 1.12 * floor
        ):
            return pre + "polluted(cpu)"
        return pre + "clean"

    print(f"{'cores':>5} {'wall_s':>8} {'docs/s':>8} {'cpu_s':>8} {'util':>6} "
          f"{'mid_med':>8} {'mid_max':>8} {'class':>18}")
    for r in runs:
        print(
            f"{r['cores']:>5} {r['link_sec']:>8.2f} {r['docs_per_sec']:>8.1f} "
            f"{r.get('engine_cpu_sec', float('nan')):>8.1f} "
            f"{r.get('cpu_utilization', float('nan')):>6.3f} "
            f"{r.get('load_mid_median', float('nan')):>8.2f} "
            f"{r.get('load_mid_max', float('nan')):>8.2f} "
            f"{classify(r):>18}"
        )

    for label, classes in (
        ("clean runs (unpinned)", ("clean", "legacy-clean")),
        ("clean runs (sized-JVM regime)", ("sized-clean",)),
    ):
        clean = [r for r in runs if classify(r) in classes]
        best = {}
        for c in (2, 8):
            xs = [r for r in clean if r["cores"] == c]
            if xs:
                best[c] = min(xs, key=lambda r: r["link_sec"])
        if len(best) == 2:
            eff = (best[8]["docs_per_sec"] / best[2]["docs_per_sec"]) / 4
            print(f"\nmin-per-level over {label}: "
                  f"2c {best[2]['link_sec']}s ({best[2]['docs_per_sec']}/s), "
                  f"8c {best[8]['link_sec']}s ({best[8]['docs_per_sec']}/s), "
                  f"efficiency {eff:.3f}")

    # same-window pairs: consume runs chronologically, pairing each run
    # with its immediate successor at the other level (this reproduces
    # the collector's per-rep interleaving; no run is counted twice)
    print("\nsame-window pairs (collector interleaving, each run used once):")
    used = [False] * len(runs)
    for i in range(len(runs) - 1):
        if used[i] or used[i + 1]:
            continue
        a, b = runs[i], runs[i + 1]
        if {a["cores"], b["cores"]} == {2, 8}:
            used[i] = used[i + 1] = True
            two = a if a["cores"] == 2 else b
            eight = a if a["cores"] == 8 else b
            pe = (eight["docs_per_sec"] / two["docs_per_sec"]) / 4
            ca, cb = classify(a), classify(b)
            if all(x in ("clean", "legacy-clean") for x in (ca, cb)):
                tag = "CLEAN"
            elif all(x == "sized-clean" for x in (ca, cb)):
                tag = "SIZED-CLEAN"
            else:
                tag = f"{ca}/{cb}"
            print(f"  2c {two['link_sec']:>7.2f}s  8c {eight['link_sec']:>7.2f}s  "
                  f"eff {pe:.3f}  [{tag}]")


if __name__ == "__main__":
    main()
