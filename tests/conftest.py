import pytest


@pytest.fixture(scope="session")
def spark():
    from index_spark.session import get_spark

    s = get_spark(cores=8, app_name="index_spark_tests", shuffle_partitions=8,
                  driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    from index_spark.sources.corpus import generate_corpus

    return generate_corpus(n_files=150)
