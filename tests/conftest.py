from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kafka_connect_logminer2_spark.session import enable_vendored_protobuf, get_spark

    # before JVM launch so PYTHONPATH/impl env reach python workers
    enable_vendored_protobuf()
    spark = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
