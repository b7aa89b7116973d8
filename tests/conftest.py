from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from agenticknowledgegraphconstructionsystem_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kg-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
