#!/usr/bin/env python
"""Round-5 scaling summary: classify runs by mid-run evidence, compute
per-level minima over clean runs, pair efficiencies (chronologically
adjacent 2c/8c runs), and the CPU-accounting decomposition.

Differences from the r4 summarizer:
  - the pinned+sized regime is a first-class class ("pinned-clean" /
    "pinned-polluted"), with its own per-level CPU floors — round 5
    runs it on an idle host where r4's pinning pathology (cannot
    migrate off a co-tenant burst) does not apply;
  - per-run hypervisor steal time (steal_sec, added to scaling_run.py
    this round) is displayed and gates cleanliness: loadavg only sees
    runnable tasks inside the VM, steal is the host depriving the VM.

A run is CLEAN when every pollution signal present says quiet:
  - load_mid_max - cores <= 2.2 (ambient during the run, own load removed)
  - engine_cpu_sec within 12% of the per-level per-regime clean minimum
    (memory-bandwidth contention inflates OUR CPU even at low loadavg)
  - steal_sec, when present, <= 2% of wall * cores

Usage: python tools/scaling_summary_r5.py runs.jsonl [runs2.jsonl ...]
"""

from __future__ import annotations

import json
import sys


def regime(r) -> str:
    if r.get("cpus_pinned") is True:
        return "pinned"
    if r.get("sized_jvm"):
        return "sized"
    return "unpinned"


def main() -> None:
    runs = []
    seen = set()
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                k = line.strip()
                if k in seen:
                    continue
                seen.add(k)
                runs.append(json.loads(line))

    cpu_floor = {}
    for c in (2, 8):
        for reg in ("pinned", "sized", "unpinned"):
            xs = [
                r["engine_cpu_sec"]
                for r in runs
                if r["cores"] == c
                and "engine_cpu_sec" in r
                and regime(r) == reg
            ]
            cpu_floor[(c, reg)] = min(xs) if xs else None

    def classify(r) -> str:
        c = r["cores"]
        reg = regime(r)
        pre = {"pinned": "pinned-", "sized": "sized-", "unpinned": ""}[reg]
        if "load_mid_max" in r and r["load_mid_max"] - c > 2.2:
            return pre + "polluted(load)"
        if r.get("steal_sec", 0) > 0.02 * r["link_sec"] * c:
            return pre + "polluted(steal)"
        floor = cpu_floor[(c, reg)]
        if (
            "engine_cpu_sec" in r
            and floor
            and r["engine_cpu_sec"] > 1.12 * floor
        ):
            return pre + "polluted(cpu)"
        return pre + "clean"

    print(
        f"{'cores':>5} {'wall_s':>8} {'docs/s':>8} {'cpu_s':>8} {'util':>6} "
        f"{'mid_max':>8} {'steal':>6} {'class':>18}"
    )
    for r in runs:
        print(
            f"{r['cores']:>5} {r['link_sec']:>8.2f} {r['docs_per_sec']:>8.1f} "
            f"{r.get('engine_cpu_sec', float('nan')):>8.1f} "
            f"{r.get('cpu_utilization', float('nan')):>6.3f} "
            f"{r.get('load_mid_max', float('nan')):>8.2f} "
            f"{r.get('steal_sec', float('nan')):>6.1f} "
            f"{classify(r):>18}"
        )

    for reg in ("sized", "pinned", "unpinned"):
        clean = [r for r in runs if classify(r) == f"{'' if reg == 'unpinned' else reg + '-'}clean"]
        best = {}
        for c in (2, 8):
            xs = [r for r in clean if r["cores"] == c]
            if xs:
                best[c] = min(xs, key=lambda r: r["link_sec"])
        if len(best) == 2:
            eff = (best[8]["docs_per_sec"] / best[2]["docs_per_sec"]) / 4
            print(
                f"\nmin-per-level over clean {reg} runs: "
                f"2c {best[2]['link_sec']}s ({best[2]['docs_per_sec']}/s), "
                f"8c {best[8]['link_sec']}s ({best[8]['docs_per_sec']}/s), "
                f"efficiency {eff:.3f}"
            )

    print("\nsame-window pairs (collector interleaving, each run used once):")
    used = [False] * len(runs)
    for i in range(len(runs) - 1):
        if used[i] or used[i + 1]:
            continue
        a, b = runs[i], runs[i + 1]
        if {a["cores"], b["cores"]} == {2, 8} and regime(a) == regime(b):
            used[i] = used[i + 1] = True
            two = a if a["cores"] == 2 else b
            eight = a if a["cores"] == 8 else b
            pe = (eight["docs_per_sec"] / two["docs_per_sec"]) / 4
            ca, cb = classify(a), classify(b)
            tag = (
                f"{regime(a).upper()}-CLEAN"
                if ca.endswith("clean") and cb.endswith("clean")
                else f"{ca}/{cb}"
            )
            # CPU-ledger decomposition: eff = (cpu2/cpu8) * (util8/util2)
            dec = ""
            if all("engine_cpu_sec" in r for r in (two, eight)):
                cr = two["engine_cpu_sec"] / eight["engine_cpu_sec"]
                ur = eight["cpu_utilization"] / two["cpu_utilization"]
                dec = f"  = cpu {cr:.3f} x util {ur:.3f}"
            print(
                f"  2c {two['link_sec']:>7.2f}s  8c {eight['link_sec']:>7.2f}s  "
                f"eff {pe:.3f}{dec}  [{tag}]"
            )


if __name__ == "__main__":
    main()
