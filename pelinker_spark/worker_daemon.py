"""Python-worker fork server with pre-imported UDF dependencies.

Spark's default worker daemon (``pyspark.daemon``) forks a fresh worker per
core on first Python-UDF use; each fork then imports numpy, pandas and
pyarrow on its first task (the Arrow serializers import them lazily).
On a 32-core session that is 32 concurrent cold imports of the scientific
stack — measured here as a multi-second tax on the FIRST query that
crosses the Python boundary (the bench's q39, synth generation, and the
pipeline warm-up all pay it).

Importing those modules in the daemon process *before* it starts forking
makes every worker inherit them via copy-on-write for free — the standard
fork-server preload trick (cf. ``multiprocessing.set_forkserver_preload``).
Behavior is otherwise identical to ``pyspark.daemon``: this module defers
to its ``manager()`` loop. Selected via ``spark.python.daemon.module``
(session.py); if this module cannot be imported on a worker host the
session builder falls back to the stock daemon.

The imports are wrapped so a stripped-down worker environment (no pandas)
degrades to exactly the stock behavior instead of failing the daemon.
"""

from __future__ import annotations

try:  # pre-warm the heavy serializer dependencies (order: cheapest last)
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (pandas<->arrow bridge)
except Exception:  # pragma: no cover - degraded env: stock behavior
    pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
