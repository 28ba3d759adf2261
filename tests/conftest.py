import pytest

from elasticsearch_drift_plugin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark-drift-tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s

