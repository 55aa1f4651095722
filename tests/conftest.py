from __future__ import annotations

import pytest

from wolf_quake_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="wolf_quake_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/wqs-warehouse"},
    )
    yield s
    s.stop()
