import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from pgsf_spark.session import get_spark

    s = get_spark("pgsf_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store(spark, tmp_path):
    from pgsf_spark.operators.table_store import TableStore

    return TableStore(spark, str(tmp_path / "store"))


SF_DIR = "/root/testdata/sf0.001"
