from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from lucene_msmarco_spark.session import build_session


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = build_session(app_name="lms-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()
