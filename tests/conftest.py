from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from t_spoon_spark.session import build_spark

    s = build_spark(app_name="t_spoon_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from t_spoon_spark.testing import duckdb_connection

    return duckdb_connection(SF_SMALL)
