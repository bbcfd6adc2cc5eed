from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prox_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    spark = get_spark("prox-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def fixtures(spark):
    from prox_spark.fixtures import make_fixtures

    return make_fixtures(spark)


@pytest.fixture(scope="session")
def silver(fixtures):
    from prox_spark.silver import to_silver

    return to_silver(fixtures)
