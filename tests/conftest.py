import pytest

from sportstv_streaming_data_warehouse_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sportstv-tests", master="local[4]", shuffle_partitions=8)
    yield s
