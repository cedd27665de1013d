from __future__ import annotations

import os

import pytest

from evolution_spark.session import get_spark

# Override with PARITY_SF_DIR=/root/testdata/sf0.01 for driver-scale checks.
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="evolution-spark-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
