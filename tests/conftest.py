import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from ksql_streams_from_schema_converter_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s
