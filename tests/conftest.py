from __future__ import annotations

import pytest

from parcialbigdata_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("parcialbigdata-tests")
    yield s
    s.stop()
