import pytest


@pytest.fixture(scope="session")
def spark():
    from defuddle_spark.spark.session import get_spark
    s = get_spark(cores=4, shuffle_partitions=8, app_name="defuddle-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
