from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from zhtml_spark.pipeline import build_session

    s = build_session(app="zhtml-spark-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
