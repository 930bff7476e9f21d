"""Process-tree CPU accounting for bench tooling.

Same ledger as tools/scaling_run.py:_tree_cpu_sec — CPU-seconds
(utime+stime+reaped children) of everything descended from this process
(the Spark JVM and its Python workers are all descendants). Lets a
receipt separate engine CPU from ambient co-tenant load; per-stage
deltas localize WHERE the engine spends CPU independent of pollution.
"""

from __future__ import annotations

import os


def tree_cpu_sec() -> float:
    me = os.getpid()
    ppid: dict[int, int] = {}
    ticks: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
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
    return total / float(os.sysconf("SC_CLK_TCK"))
