import tempfile

import pytest

from sportstv_streaming_data_warehouse_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="sportstv-warehouse-")
    s = get_spark(
        app_name="sportstv-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running reference-scale tests (deselect with -m 'not slow')"
    )
