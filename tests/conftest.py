import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="datax_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "table")
