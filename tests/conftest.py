from __future__ import annotations

import pytest

from jerex_spark.caching import release_persisted
from jerex_spark.session import build_session

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="jerex-spark-tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_operator_caches():
    """Operators persist intermediates (dedup signatures, canon
    vocabularies); drop them after each test so the session doesn't
    accumulate cached blocks."""
    yield
    release_persisted()


@pytest.fixture(scope="session")
def sf0001():
    return f"{TESTDATA}/sf0.001"


@pytest.fixture(scope="session")
def sf001():
    return f"{TESTDATA}/sf0.01"
