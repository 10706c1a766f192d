"""The events table's parquet timestamp layout has changed between
driver testdata generations (TIMESTAMP(NANOS) → TIMESTAMP_NTZ(us)).
These tests write all three physical layouts and assert both readers
(`session.load`-style batch normalization, `stream_events_auto`)
produce identical UTC-session TIMESTAMP values for each — locking the
engine against the next regeneration."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
    stream_events_auto,
)

ROWS = [
    (1, dt.datetime(2024, 3, 1, 12, 0, 0), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 3, 1, 12, 30, 0), 11, "view", 2.5, "{}"),
    (3, dt.datetime(2024, 3, 1, 13, 0, 0), 10, "purchase", 9.0, "{}"),
]


def _write(path: str, ts_type: pa.DataType, version: str) -> None:
    cols = list(zip(*ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1]).cast(ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, path, version=version, coerce_timestamps=None)


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("events_layouts")
    layouts = {
        # TIMESTAMP(NANOS): needs parquet format v2.6; Spark can't read
        # it natively (the nanosAsLong path)
        "nanos": (pa.timestamp("ns"), "2.6"),
        # TIMESTAMP_NTZ(us): isAdjustedToUTC=false — the round-4 testdata
        "ntz_us": (pa.timestamp("us"), "2.4"),
        # TIMESTAMP(us, UTC): isAdjustedToUTC=true — plain LTZ
        "ltz_us": (pa.timestamp("us", tz="UTC"), "2.4"),
    }
    dirs = {}
    for name, (typ, ver) in layouts.items():
        d = base / name
        d.mkdir()
        _write(str(d / "events.parquet"), typ, ver)
        dirs[name] = str(d)
    return dirs


def _batch_values(spark, sf_dir):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load

    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    return sorted(
        (r["event_id"], r["ts_s"])
        for r in df.select(
            "event_id", F.col("ts").cast("string").alias("ts_s")
        ).collect()
    )


def _stream_values(spark, src_dir):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        run_available_now,
    )

    sdf = stream_events_auto(spark, src_dir)
    out = run_available_now(
        sdf.select("event_id", F.col("ts").cast("string").alias("ts_s")),
        f"layout_{os.path.basename(src_dir)}",
        output_mode="append",
    )
    return sorted((r["event_id"], r["ts_s"]) for r in out.collect())


def test_all_layouts_batch_identical(spark, layout_dirs):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    vals = {name: _batch_values(spark, d) for name, d in layout_dirs.items()}
    assert vals["nanos"] == vals["ntz_us"] == vals["ltz_us"]
    assert vals["nanos"][0] == (1, "2024-03-01 12:00:00")


def test_all_layouts_stream_identical(spark, layout_dirs):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    vals = {name: _stream_values(spark, d) for name, d in layout_dirs.items()}
    assert vals["nanos"] == vals["ntz_us"] == vals["ltz_us"]
    assert vals["nanos"][0] == (1, "2024-03-01 12:00:00")
