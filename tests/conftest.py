from __future__ import annotations

import os

import pytest

# unit tests build many short-lived plans on tiny data — the session
# warm-up's pipeline pass (sized for production batches via
# PELINKER_WARM_PAGES) would cost more than it saves here
os.environ.setdefault("PELINKER_WARM_PAGES", "0")

from pelinker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pelinker_spark_tests", cores=8, shuffle_partitions=8)
    yield s
