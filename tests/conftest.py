import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_pipeline_spark.plans.job import default_session

    s = default_session("local[8]", app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
