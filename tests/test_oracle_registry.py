"""Registry-consistency guards for the driver correctness gate.

The driver pairs every queries() entry with its oracle_sql() SQL and
value-hash-compares them at sf0.01; a key drift between the two dicts
(or a query that silently vanishes from the registry) would weaken the
gate without failing any other test. Pure-python — no SparkSession.
"""

from __future__ import annotations

import re

from pelinker_spark.operators.relational import ORACLES, QUERIES


def test_every_query_has_an_oracle():
    # all current queries are SQL-expressible by construction; a new
    # non-SQL-expressible op should be added HERE as a documented
    # exemption, not silently dropped from ORACLES
    assert set(QUERIES) == set(ORACLES)


def test_registry_is_complete_and_ordered():
    nums = sorted(int(re.match(r"q(\d+)_", k).group(1)) for k in QUERIES)
    assert nums == list(range(1, len(QUERIES) + 1))
    assert len(QUERIES) >= 45


def test_oracles_are_nonempty_sql():
    for k, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), k


def test_queries_are_callables_with_spark_sfdir_arity():
    import inspect

    for k, fn in QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], k
