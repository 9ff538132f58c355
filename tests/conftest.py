import pytest


@pytest.fixture(scope="session")
def spark():
    from sis_spark.session import get_spark

    s = get_spark("sis_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SIS_SPARK_TEST_SF", "/root/testdata/sf0.001")
