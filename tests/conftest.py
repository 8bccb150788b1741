from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from embed_rerank_spark.session import get_spark

    s = get_spark(app_name="embed-rerank-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
