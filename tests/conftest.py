import pytest

from asid_v2_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield sp
    sp.stop()
