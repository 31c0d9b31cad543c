import pytest


@pytest.fixture(scope="session")
def spark():
    from hinbox_spark.session import get_spark

    s = get_spark("hinbox_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
