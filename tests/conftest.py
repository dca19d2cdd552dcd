import pytest


@pytest.fixture(scope="session")
def spark():
    from high_performance_parallel_search_engine_spark.session import build_session

    s = build_session("hppse-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
