from __future__ import annotations

import pytest

from jerex_spark.session import build_session

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="jerex-spark-tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf0001():
    return f"{TESTDATA}/sf0.001"


@pytest.fixture(scope="session")
def sf001():
    return f"{TESTDATA}/sf0.01"
