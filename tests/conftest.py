import pytest

from etl_data_transformer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def star(spark):
    from etl_data_transformer_spark.sources.readers import load_star

    return load_star(spark, SF_DIR)
