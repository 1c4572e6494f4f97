from __future__ import annotations

import pytest

from co_deduplicate_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="co_dedup_tests", cores=8, driver_memory="16g")
    yield s
    s.stop()


SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}
