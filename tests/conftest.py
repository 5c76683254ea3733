import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=int(os.environ.get("TEST_CORES", "8")), app_name="moonlink-tests",
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()
