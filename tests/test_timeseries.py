"""Time-series resample/gap-fill (operators/timeseries.py)."""

import datetime as dt

import pytest

from vastdb_sdk_spark.errors import InvalidArgument
from vastdb_sdk_spark.operators.timeseries import resample

DAY = 86_400_000_000


def _series(spark):
    # user 1: observations on days 0, 1, 4 (gap of 2 empty days);
    # user 2: a single observation (no gaps possible)
    rows = [
        (1, 0 * DAY + 5, 10.0),
        (1, 0 * DAY + 9, 20.0),  # same bucket as above
        (1, 1 * DAY + 1, 30.0),
        (1, 4 * DAY + 2, 90.0),
        (2, 2 * DAY + 7, 7.0),
    ]
    return spark.createDataFrame(rows, "uid LONG, ts LONG, v DOUBLE")


def test_interp_lerps_interior_gaps_only(spark):
    out = resample(
        _series(spark), "ts", ["uid"], DAY, "v", how="interp", bucket_agg="max"
    )
    got = {(r["uid"], r["bucket_ts"] // DAY): (r["observed"], r["filled"])
           for r in out.collect()}
    assert got == {
        (1, 0): (20.0, 20.0),   # max of the two same-bucket obs
        (1, 1): (30.0, 30.0),
        (1, 2): (None, 50.0),   # 30 + (90-30) * 1/3
        (1, 3): (None, 70.0),   # 30 + (90-30) * 2/3
        (1, 4): (90.0, 90.0),
        (2, 2): (7.0, 7.0),
    }


def test_ffill_carries_last_observation(spark):
    out = resample(
        _series(spark), "ts", ["uid"], DAY, "v", how="ffill", bucket_agg="max"
    )
    got = {(r["uid"], r["bucket_ts"] // DAY): r["filled"] for r in out.collect()}
    assert got[(1, 2)] == 30.0 and got[(1, 3)] == 30.0


def test_none_mode_keeps_gaps_null_and_avg_agg(spark):
    out = resample(
        _series(spark), "ts", ["uid"], DAY, "v", how="none", bucket_agg="avg"
    )
    got = {(r["uid"], r["bucket_ts"] // DAY): r["filled"] for r in out.collect()}
    assert got[(1, 0)] == 15.0  # avg of 10, 20
    assert got[(1, 2)] is None and got[(1, 3)] is None


def test_timestamp_typed_input(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(days=2), 3.0),
    ]
    df = spark.createDataFrame(rows, "uid LONG, ts TIMESTAMP, v DOUBLE")
    out = resample(df, "ts", ["uid"], DAY, "v", how="interp")
    got = sorted((r["bucket_ts"] // DAY, r["filled"]) for r in out.collect())
    days = (base - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)).days
    assert got == [(days, 1.0), (days + 1, 2.0), (days + 2, 3.0)]


def test_argument_validation(spark):
    d = _series(spark)
    with pytest.raises(InvalidArgument):
        resample(d, "ts", ["uid"], DAY, "v", how="bfill")
    with pytest.raises(InvalidArgument):
        resample(d, "ts", ["uid"], DAY, "v", bucket_agg="last")
    with pytest.raises(InvalidArgument):
        resample(d, "ts", ["uid"], 0, "v")
    with pytest.raises(InvalidArgument):
        resample(d, "ts", [], DAY, "v")


def test_max_buckets_guard_fails_runtime(spark):
    d = _series(spark)
    out = resample(d, "ts", ["uid"], DAY, "v", max_buckets_per_group=3)
    with pytest.raises(Exception, match="max_buckets_per_group"):
        out.collect()  # user 1 spans 5 buckets > 3


def test_rolling_anomaly_flags_planted_spike(spark):
    from vastdb_sdk_spark.operators.timeseries import rolling_anomaly_flags

    # stable history 10 +/- 1 for 8 days, then a day-9 spike of 100
    rows = []
    for d in range(8):
        rows.append((1, d * DAY + 1, 10.0 + (d % 2) * 2.0 - 1.0))
    rows.append((1, 8 * DAY + 1, 100.0))
    df = spark.createDataFrame(rows, "uid LONG, ts LONG, v DOUBLE")
    out = {r["bucket_ts"] // DAY: (r["zscore"], r["is_anomaly"])
           for r in rolling_anomaly_flags(
               df, "ts", ["uid"], DAY, "v",
               window=7, min_periods=3, z_threshold=3.0).collect()}
    # first buckets lack history -> NULL score
    assert out[0] == (None, None) and out[2] == (None, None)
    # the spike is flagged; the stable days are not
    z, flag = out[8]
    assert flag is True and z > 10
    for d in range(3, 8):
        assert out[d][1] is False


def test_rolling_anomaly_zero_variance_and_validation(spark):
    import pytest

    from vastdb_sdk_spark.operators.timeseries import rolling_anomaly_flags
    from vastdb_sdk_spark.errors import InvalidArgument

    rows = [(1, d * DAY, 5.0) for d in range(6)]  # constant series
    df = spark.createDataFrame(rows, "uid LONG, ts LONG, v DOUBLE")
    out = rolling_anomaly_flags(df, "ts", ["uid"], DAY, "v",
                                window=4, min_periods=2).collect()
    # zero history variance -> NULL score everywhere, never a div-by-zero
    assert all(r["zscore"] is None for r in out)
    with pytest.raises(InvalidArgument):
        rolling_anomaly_flags(df, "ts", ["uid"], DAY, "v", window=0)
