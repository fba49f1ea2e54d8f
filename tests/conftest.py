import pytest

from jschon_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(cpus=4, app_name="jschon_spark_tests", shuffle_partitions=4)
    yield s
