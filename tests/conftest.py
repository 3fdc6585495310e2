from __future__ import annotations

import pytest

from tripleforge.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tripleforge-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
