import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    session = get_spark(app_name="dpr_spark_tests", shuffle_partitions=8)
    yield session
