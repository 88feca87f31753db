import pytest


@pytest.fixture(scope="session")
def spark():
    from pagerank_spark.session import get_spark

    s = get_spark(
        app_name="pagerank-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
