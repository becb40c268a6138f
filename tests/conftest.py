import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wrap_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("etl_wrap_spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
