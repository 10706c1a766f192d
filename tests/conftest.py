from __future__ import annotations

import tempfile

import pytest

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
