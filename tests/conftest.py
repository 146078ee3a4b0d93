import pytest

from preprocessor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("preprocessor_spark_tests", master="local[4]")
    yield s
    s.stop()
