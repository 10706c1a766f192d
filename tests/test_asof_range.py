"""As-of join (union-trick) and binned range join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.joins import (
    asof_join,
    range_join,
)

T = datetime.datetime


def _events(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", T(2024, 1, 1, 10, 0, 0), 9.0),
            (2, "u1", T(2024, 1, 1, 12, 0, 0), 8.0),
            (3, "u2", T(2024, 1, 1, 11, 0, 0), 7.0),
            (4, "u3", T(2024, 1, 1, 11, 0, 0), 6.0),  # no clicks at all
        ],
        "event_id int, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("u1", T(2024, 1, 1, 9, 30, 0), 1.0),
            ("u1", T(2024, 1, 1, 11, 59, 0), 2.0),
            ("u1", T(2024, 1, 1, 13, 0, 0), 3.0),  # after everything
            ("u2", T(2024, 1, 1, 11, 0, 0), 4.0),  # exact tie with event 3
        ],
        "user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_basic(spark):
    left, right = _events(spark)
    out = asof_join(left, right, "user_id", "ts", "ts", ["value"])
    got = {r["event_id"]: r["right_value"] for r in out.collect()}
    # 10:00 → 9:30 click; 12:00 → 11:59 click; 11:00@u2 → equal-ts match
    assert got == {1: 1.0, 2: 2.0, 3: 4.0, 4: None}
    # schema: left columns preserved + right_ts + right_value appended
    assert out.columns == ["event_id", "user_id", "ts", "value", "right_ts", "right_value"]


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _events(spark)
    out = asof_join(
        left, right, "user_id", "ts", "ts", ["value"],
        tolerance_seconds=60.0,
    )
    got = {r["event_id"]: r["right_value"] for r in out.collect()}
    # only the 12:00 purchase has a click within 60s (11:59); u2's
    # equal-ts match has gap 0 and survives
    assert got == {1: None, 2: 2.0, 3: 4.0, 4: None}


def test_asof_forward_basic_and_tolerance(spark):
    """direction='forward' picks the EARLIEST right row at-or-after
    each left ts; exact-ts ties still match; tolerance nulls matches
    farther ahead than the bound."""
    left, right = _events(spark)
    out = asof_join(
        left, right, "user_id", "ts", "ts", ["value"], direction="forward"
    )
    got = {r["event_id"]: r["right_value"] for r in out.collect()}
    # 10:00 → 11:59 click ahead; 12:00 → 13:00; u2 11:00 → equal-ts
    # match; u3 has no clicks
    assert got == {1: 2.0, 2: 3.0, 3: 4.0, 4: None}
    tol = asof_join(
        left, right, "user_id", "ts", "ts", ["value"],
        direction="forward", tolerance_seconds=3600.0,
    )
    got_tol = {r["event_id"]: r["right_value"] for r in tol.collect()}
    # event 1's match is 119 min ahead -> nulled; event 2's is 60 min
    # (exactly the bound) -> kept
    assert got_tol == {1: None, 2: 3.0, 3: 4.0, 4: None}


def test_asof_preserves_left_rowcount(spark):
    left, right = _events(spark)
    assert asof_join(left, right, "user_id", "ts", "ts", ["value"]).count() == left.count()


def test_range_join_matches_naive(spark):
    base = T(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    left = spark.createDataFrame(
        [(i, base + i * 7 * sec) for i in range(60)],
        "lid int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, base + i * 11 * sec) for i in range(40)],
        "rid int, rts timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(left, right, "lts", "rts", 10.0).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 SECONDS")),
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_range_join_extra_predicate(spark):
    left = spark.createDataFrame(
        [(1, "eu", T(2024, 1, 1)), (2, "us", T(2024, 1, 1))],
        "lid int, region string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "eu", T(2024, 1, 1, 0, 0, 30))],
        "rid int, rregion string, rts timestamp",
    )
    out = range_join(
        left, right, "lts", "rts", 60.0,
        extra_on=F.col("region") == F.col("rregion"),
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 10)]


def test_asof_join_carries_null_values_in_matched_row(spark):
    """A NULL VALUE inside the matched right row must survive
    attachment — per-column last(ignorenulls) would silently substitute
    the previous non-null value (the bug scd2_pit_join's open-ended
    end_dt exposed): the matched row carries as one struct."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, T(2024, 1, 5)), (1, T(2024, 1, 2))], "lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1), 10), (1, T(2024, 1, 4), None)],
        "lid long, ts timestamp, v int",
    )
    out = {
        r.ts: r.right_v
        for r in asof_join(
            left, right, on="lid", left_ts="ts", right_ts="ts",
            right_cols=["v"],
        ).collect()
    }
    assert out[T(2024, 1, 2)] == 10
    # the 2024-01-04 match holds v = NULL; 10 must NOT leak forward
    assert out[T(2024, 1, 5)] is None


def test_scd2_pit_join_validity_and_gap_nulls(spark):
    """Point-in-time join semantics: facts attach the version covering
    their date (inclusive end), facts BEFORE the first version or in a
    validity GAP (closed last version) attach NULLs — never a stale
    earlier version."""
    from datetime import date

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.joins import (
        scd2_pit_join,
    )

    dim = spark.createDataFrame(
        [
            (1, date(2020, 1, 1), date(2020, 12, 31), "v1"),
            (1, date(2021, 1, 1), date(2021, 12, 31), "v2"),  # gap after
            (1, date(2023, 1, 1), None, "v3"),                # open-ended
        ],
        "k long, start_dt date, end_dt date, ver string",
    )
    facts = spark.createDataFrame(
        [
            (100, date(2019, 6, 1)),   # before first version -> NULL
            (101, date(2020, 12, 31)), # inclusive end boundary -> v1
            (102, date(2021, 6, 1)),   # inside v2 -> v2
            (103, date(2022, 6, 1)),   # in the 2022 GAP -> NULL
            (104, date(2024, 6, 1)),   # open-ended current -> v3
        ],
        "fid long, d date",
    ).withColumn("k", F.lit(1))
    out = {
        r.fid: (r.right_ver, r.right_start_dt)
        for r in scd2_pit_join(
            facts, dim, on="k", fact_ts="d", dim_cols=["ver"]
        ).collect()
    }
    assert out[100] == (None, None)
    assert out[101] == ("v1", date(2020, 1, 1))
    assert out[102] == ("v2", date(2021, 1, 1))
    assert out[103] == (None, None)  # gap: stale v2 must NOT attach
    assert out[104] == ("v3", date(2023, 1, 1))
    # half-open convention: the end boundary now falls out
    half = {
        r.fid: r.right_ver
        for r in scd2_pit_join(
            facts, dim, on="k", fact_ts="d", dim_cols=["ver"],
            end_inclusive=False,
        ).collect()
    }
    assert half[101] is None
    assert half[102] == "v2" and half[104] == "v3"
    # TIMESTAMP facts against DATE validity columns: inclusive end
    # means "through the END of that day" — a 10:00 fact on the last
    # valid day must match (date->timestamp promotion would compare
    # against midnight and wrongly report a gap)
    ts_facts = spark.createDataFrame(
        [(201, T(2020, 12, 31, 10, 0)), (202, T(2021, 1, 1, 0, 0))],
        "fid long, d timestamp",
    ).withColumn("k", F.lit(1))
    ts_out = {
        r.fid: r.right_ver
        for r in scd2_pit_join(
            ts_facts, dim, on="k", fact_ts="d", dim_cols=["ver"]
        ).collect()
    }
    assert ts_out[201] == "v1"  # inside v1 through end of 2020-12-31
    assert ts_out[202] == "v2"  # first instant of v2
