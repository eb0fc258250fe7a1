import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import pytest  # noqa: E402

from solarboat_data_pipeline_spark import get_spark  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="solarboat-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA_ROOT, "sf0.001")
