import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_to_text_spark.config import build_spark

    s = build_spark("pdf_to_text_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
