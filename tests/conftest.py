from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ml_with_spark_streaming_spark.session import get_spark

    # One JVM hosts the whole suite (140+ tests); checkpointed RDDs,
    # broadcasts, and streaming state accumulate until the
    # ContextCleaner gets to them, and the 8g default heap has OOMed a
    # late streaming test under full-suite load. The box has 128 GiB.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
