import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from osm_hadoop_spark.session import get_spark

    s = get_spark(
        "osm-hadoop-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def db_snapshot_docs(spark):
    from osm_hadoop_spark.sources.fixtures import gen_db_snapshot_documents

    return gen_db_snapshot_documents(spark).cache()


@pytest.fixture(scope="session")
def synth_docs(spark):
    from osm_hadoop_spark.sources.fixtures import gen_documents

    return gen_documents(spark, 2000, seed=42).cache()
