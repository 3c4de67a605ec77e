"""Golden ports of the reference's simple_features / simple_features_daily
tests (SURVEY §5) against the Spark-native domain operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mhealth_spark.activity import aggregate_active_duration
from mhealth_spark.audio import aggregate_audio_exposure
from mhealth_spark.schema import HK_EVENT_SCHEMA
from mhealth_spark.sleep import aggregate_sleep_categories, daily_sleep_features
from mhealth_spark.vitals import aggregate_vital
from mhealth_spark.watch import watch_on_hours_daily, watch_on_stats
from tests import fixtures


def _to_spark(spark, pdf):
    cols = [f.name for f in HK_EVENT_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], schema=HK_EVENT_SCHEMA)


# --- reference test_dailySleepFeatures_basic ------------------------------
def test_daily_sleep_features_basic(spark):
    df = _to_spark(spark, fixtures.sleep_period_2_days())
    out = daily_sleep_features(df).toPandas().sort_values("date")
    assert len(out) == 2
    assert (out["sleep_bedrestDuration_day"] == 6).all()
    assert (out["sleep_sleepDuration_day"] == 4).all()
    assert np.allclose(out["sleep_sleepEfficiency_day"], 4 / 6)
    assert (out["sleep_bedrestOnsetHours_day"] == 22).all()
    assert (out["sleep_bedrestOffsetHours_day"] == 30).all()
    assert (out["sleep_sleepOnsetHours_day"] == 26).all()
    assert (out["sleep_sleepOffsetHours_day"] == 30).all()
    assert (out["sleep_wakeAfterSleepOnset_day"] == 0).all()


# --- reference test_dailySleepFeatures_multiple_sleep ---------------------
def test_daily_sleep_features_fragmented(spark):
    df = _to_spark(spark, fixtures.sleep_period_fragmented())
    out = daily_sleep_features(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["sleep_bedrestDuration_day"] == 7
    assert r["sleep_sleepDuration_day"] == 5
    assert np.isclose(r["sleep_sleepEfficiency_day"], 5 / 7)
    assert r["sleep_bedrestOnsetHours_day"] == 22
    assert r["sleep_bedrestOffsetHours_day"] == 32
    assert r["sleep_sleepOnsetHours_day"] == 26
    assert r["sleep_sleepOffsetHours_day"] == 32
    assert r["sleep_wakeAfterSleepOnset_day"] == 1


# --- reference test_dailySleepCategories ----------------------------------
def test_daily_sleep_categories(spark):
    from mhealth_spark.features import _daily_sleep_categories

    df = _to_spark(spark, fixtures.sleep_period_2_days())
    out = _daily_sleep_categories(df).toPandas().sort_values("date")
    assert len(out) == 2
    assert out["date"].min() == pd.to_datetime("2023-01-02").date()
    assert (out["sleep_Asleep_count"] == 1).all()
    assert (out["sleep_Asleep_mean"] == 4).all()
    assert (out["sleep_InBed_mean"] == 1).all()


# --- reference test_hr_context --------------------------------------------
@pytest.mark.parametrize(
    "context,mean,count",
    [("non-sleep rest", 75.0, 1.0), ("active", 100.0, 1.0), ("sleep", 40.0, 1.0)],
)
def test_hr_context(spark, context, mean, count):
    df = _to_spark(spark, fixtures.hr_context())
    out = aggregate_vital(
        df,
        "HeartRate",
        standard_aggregations=["mean", "count"],
        linear_time_aggregations=False,
        context=context,
    ).toPandas()
    ctx = "nonsleep-rest_" if context == "non-sleep rest" else f"{context}_"
    assert len(out) == 1
    assert out[f"HeartRate_{ctx}mean"].iloc[0] == mean
    assert out[f"HeartRate_{ctx}count"].iloc[0] == count


# --- reference test_audio_exposure (+ daily variant) ----------------------
def test_audio_exposure(spark):
    df = _to_spark(spark, fixtures.audio_exposure())
    out = aggregate_audio_exposure(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["audioExposure_mean"] == 65
    assert r["audioExposure_count"] == 101
    assert r["audioExposure_entries"] == 2
    assert round(r["audioExposure_hours"] * 60) == 31


def test_audio_exposure_daily(spark):
    df = _to_spark(spark, fixtures.audio_exposure()).withColumn(
        "_day", F.date_trunc("DAY", "local_start")
    )
    out = aggregate_audio_exposure(df, group_cols=["user_id", "_day"]).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["audioExposure_mean"] == 65
    assert r["audioExposure_count"] == 101
    assert r["audioExposure_entries"] == 2
    assert round(r["audioExposure_hours"] * 60) == 31


# --- reference test_aggregateActiveDaily ----------------------------------
def test_aggregate_active_daily(spark):
    df = _to_spark(spark, fixtures.activity_overlap()).withColumn(
        "_day", F.date_trunc("DAY", "local_start")
    )
    out = aggregate_active_duration(
        df, "ActiveEnergyBurned", group_cols=["user_id", "_day"], resample_hours=1.0
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert np.isclose(r["ActiveEnergyBurned_sum"], 150 / 4184)
    assert r["ActiveEnergyBurned_count"] == 1
    assert r["ActiveEnergyBurned_duration"] == 1.5


# --- reference test_processWatchOnPercent ---------------------------------
def test_watch_on_percent(spark):
    rows = [
        dict(
            user_id="test",
            local_start=f"2022-01-01 0{h}:00:01",
            local_end=f"2022-01-01 0{h}:00:01",
            type="HeartRate",
            value=str(v),
            device_name="Apple Watch",
        )
        for h, v in zip(range(1, 6), [70, 80, 90, 100, 110])
    ]
    pdf = fixtures._frame(rows)
    df = _to_spark(spark, pdf).withColumn(
        "_o", F.lit("2022-01-01 00:00:00").cast("timestamp_ntz")
    ).withColumn("_e", F.lit("2022-01-01 06:00:00").cast("timestamp_ntz"))
    out = watch_on_stats(df, "_o", "_e").toPandas()
    np.testing.assert_almost_equal(
        out["watch_on_percent"].iloc[0], 100 * (5 / 7)
    )
    assert out["watch_on_hours"].iloc[0] == 5


# --- reference test_aggregateVitalsDaily (shape) --------------------------
def test_vitals_daily_shape(spark):
    from mhealth_spark.features import _daily_vitals

    df = _to_spark(spark, fixtures.heart_rate_2_days())
    out = _daily_vitals(df, "HeartRate", with_models=True).toPandas()
    assert len(out) == 2
    assert "HeartRate_mean_day" in out.columns
    assert "HeartRate_circadian_mesor_day" in out.columns


# --- sleep categories batch (A2) ------------------------------------------
def test_sleep_categories(spark):
    df = _to_spark(spark, fixtures.sleep_period_2_days())
    out = aggregate_sleep_categories(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["sleep_Asleep_count"] == 2
    assert r["sleep_Asleep_sum"] == 8
    assert r["sleep_Asleep_mean"] == 4
    assert r["sleep_InBed_count"] == 2
    assert r["sleep_InBed_sum"] == 2


def test_watch_on_hours_daily(spark):
    df = _to_spark(spark, fixtures.heart_rate_2_days())
    out = watch_on_hours_daily(df).toPandas().sort_values("date")
    assert len(out) == 2
    assert list(out["watchOnHours_sum_day"]) == [1.0, 1.0]
