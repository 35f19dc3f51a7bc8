import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from content_extractor_spark.session import get_spark

    s = get_spark(
        app_name="content-extractor-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.sources.partitionOverwriteMode": "dynamic",
            "spark.driver.host": "127.0.0.1",
        },
    )
    yield s
    s.stop()
