import pytest


@pytest.fixture(scope="session")
def spark():
    from richdem_spark.session import get_spark

    s = get_spark(app="richdem_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run watershed-scale (multi-million-cell) tests",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: watershed-scale test (needs --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
