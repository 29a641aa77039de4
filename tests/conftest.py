from __future__ import annotations

import pytest

from pyspark_data_engineering_assignment_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-pipeline tests that run at driver SF scale"
    )
