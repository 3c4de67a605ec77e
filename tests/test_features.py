"""E1/E2 pipeline tests: shape, determinism, and the north_rule
zero-temporal-leakage property on the FULL feature pipeline."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from mhealth_spark.features import collect_all_daily_features, generate_hk_features
from mhealth_spark.qc import healthkit_qc_fill_nan, qc_watch_data_daily
from mhealth_spark.synth import hk_to_spark, synth_healthkit


def _requests(spark, n_users=3):
    rows = [
        dict(
            request_id=i,
            user_id=f"u{i % n_users}",
            ts=dt.datetime(2024, 1, 5 + (i % 3), 10 + i, 30),
            lookback_hours=72.0,
        )
        for i in range(6)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_generate_hk_features_shape(spark):
    hk = hk_to_spark(spark, synth_healthkit(n_users=3, days=7, seed=11))
    reqs = _requests(spark)
    out = generate_hk_features(hk, reqs).toPandas()
    assert len(out) == 6
    # flagship feature families present
    for col in [
        "sleep_sleepDuration_day_mean",
        "sleep_Asleep_sum",
        "ActiveEnergyBurned_sum",
        "StepCount_sum",
        "audioExposure_mean",
        "bedrest_audioExposure_mean",
        "HeartRate_mean",
        "HeartRate_bedrest_median",
        "HeartRate_slope",
        "HeartRate_spectral_entropy",
        "QC_watch_on_percent",
        "QC_duration_days",
        "QC_ndates",
        "survey_start",
        "user_id",
    ]:
        assert col in out.columns, col
    assert out["QC_duration_days"].between(0, 3.01).all()
    # HR in range for synthetic data
    assert out["HeartRate_mean"].dropna().between(30, 200).all()


def test_e1_zero_temporal_leakage(spark):
    """Perturb every event strictly after each request's window end — the
    full E1 feature vectors must be identical."""
    pdf = synth_healthkit(n_users=2, days=7, seed=23)
    reqs = _requests(spark, n_users=2)
    cutoff = dt.datetime(2024, 1, 8, 23, 59)

    perturbed = pdf.copy()
    future = perturbed.local_start > cutoff
    perturbed.loc[future, "value_num"] = perturbed.loc[future, "value_num"] * 7 + 1
    perturbed.loc[future, "value"] = perturbed.loc[future, "value_num"].astype(str)

    def run(p):
        out = (
            generate_hk_features(hk_to_spark(spark, p), reqs)
            .toPandas()
            .sort_values("request_id")
            .reset_index(drop=True)
        )
        return out[sorted(out.columns)]

    a, b = run(pdf), run(perturbed)
    assert (a["survey_start"] <= cutoff).all()
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_e1_qc_postprocessing(spark):
    hk = hk_to_spark(spark, synth_healthkit(n_users=2, days=7, seed=5))
    reqs = _requests(spark, n_users=2)
    wide = generate_hk_features(hk, reqs, with_lomb_scargle=False)
    out = healthkit_qc_fill_nan(
        wide, watch_on_threshold=0.0, duration_threshold=0.0
    ).toPandas()
    assert "QC_duration_percent" in out.columns
    assert len(out) == 6


def test_collect_all_daily_features(spark):
    hk = hk_to_spark(spark, synth_healthkit(n_users=2, days=5, seed=9))
    out = collect_all_daily_features(hk).toPandas()
    assert {"user_id", "date"} <= set(out.columns)
    for col in [
        "HeartRate_mean_day",
        "HeartRate_circadian_mesor_day",
        "HeartRateVariabilitySDNN_slope_day",
        "watchOnHours_sum_day",
        "sleep_Asleep_sum",
        "sleep_sleepDuration_day",
        "ActiveEnergyBurned_sum",
        "StepCount_sum",
        "audioExposure_mean",
    ]:
        assert col in out.columns, col
    assert out.groupby(["user_id", "date"]).size().max() == 1
    masked = qc_watch_data_daily(
        spark.createDataFrame(out.where(pd.notnull(out), None))
    ).toPandas()
    assert len(masked) == len(out)


def test_calc_start_stop_duration_literals(spark):
    """F2 golden (reference simple_features.py:102-142): 'today'/'yesterday'
    duration literals incl. the before-4am shift-back, on both sides of 4am.
    Expected values hand-derived from the reference's calcStartStop:
      today  @03:59 -> [prev midnight-1d, prev midnight)  (shift-back)
      today  @04:01 -> [same-day midnight, next midnight)
      yesterday at ANY hour -> previous day (the reference's hour<4 branch
      overwrites start with the same value, so no behavioural change).
    """
    from pyspark.sql import functions as F

    from mhealth_spark.features import calc_start_stop

    pdf = pd.DataFrame(
        {
            "rid": ["a", "b"],
            "ts": pd.to_datetime(["2024-01-05 03:59:00", "2024-01-05 04:01:00"]),
        }
    )
    df = spark.createDataFrame(pdf)

    def got(duration):
        s, e = calc_start_stop(F.col("ts"), duration)
        out = (
            df.select("rid", s.alias("s"), e.alias("e"))
            .orderBy("rid")
            .toPandas()
        )
        return [(str(r.s), str(r.e)) for r in out.itertuples()]

    assert got("today") == [
        ("2024-01-04 00:00:00", "2024-01-05 00:00:00"),
        ("2024-01-05 00:00:00", "2024-01-06 00:00:00"),
    ]
    assert got("yesterday") == [
        ("2024-01-04 00:00:00", "2024-01-05 00:00:00"),
        ("2024-01-04 00:00:00", "2024-01-05 00:00:00"),
    ]
    # Timedelta-string and numeric-hours paths agree
    assert got("36h") == got(36.0) == [
        ("2024-01-03 15:59:00", "2024-01-05 03:59:00"),
        ("2024-01-03 16:01:00", "2024-01-05 04:01:00"),
    ]


def test_slice_requests_today_includes_same_day_future(spark):
    """Reference quirk: a 'today' window ends at midnight AFTER the request
    ts, so same-day events LATER than the request are included."""
    from pyspark.sql import functions as F  # noqa: F401

    from mhealth_spark.features import slice_requests
    from mhealth_spark.synth import hk_to_spark, synth_healthkit  # noqa: F811

    hk = hk_to_spark(spark, synth_healthkit(n_users=1, days=2, seed=5))
    reqs = spark.createDataFrame(
        pd.DataFrame(
            {
                "request_id": ["r1"],
                "user_id": ["u0"],
                "ts": pd.to_datetime(["2024-01-02 10:00:00"]),
            }
        )
    )
    sliced = slice_requests(hk, reqs, duration="today").toPandas()
    assert (sliced["_wstart"] == pd.Timestamp("2024-01-02")).all()
    assert (sliced["_wend"] == pd.Timestamp("2024-01-03")).all()
    # at least one included event starts after the request timestamp
    assert (sliced["local_start"] > pd.Timestamp("2024-01-02 10:00:00")).any()
