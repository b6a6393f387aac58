from __future__ import annotations

import pytest

from nyc_taxi_data_prediction_pyspark_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001
