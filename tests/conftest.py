from __future__ import annotations

import pytest

from gfe_db_spark.session import get_spark

#: single source of truth for the driver-generated testdata root — every
#: test derives scale dirs from here (r12 advice: no inline literals).
TESTDATA_ROOT = "/root/testdata"
SF_SMOKE = f"{TESTDATA_ROOT}/sf0.001"
SF_CORRECT = f"{TESTDATA_ROOT}/sf0.01"
SF_BENCH = f"{TESTDATA_ROOT}/sf0.1"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("gfe_db_spark_tests", cpus="8")
    yield spark
