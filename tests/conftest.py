import pytest


@pytest.fixture(scope="session")
def spark():
    from richdem_spark.session import get_spark

    s = get_spark(app="richdem_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()
