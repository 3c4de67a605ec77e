"""Golden ports of the reference's data_cleaning tests (SURVEY §5) plus a
differential parity check against the reference's pure-pandas algorithms
(imported as an oracle when available — never copied)."""

from __future__ import annotations

import datetime as dt
import sys

import numpy as np
import pandas as pd
import pytest

from mhealth_spark.intervals import (
    _combine_overlaps_pdf,
    _combine_overlaps_sleep_pdf,
    combine_overlaps,
    combine_overlaps_sleep,
    merge_intervals,
    sessionize,
)
from mhealth_spark.schema import HK_EVENT_SCHEMA
from tests import fixtures


def _to_spark(spark, pdf):
    cols = [f.name for f in HK_EVENT_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], schema=HK_EVENT_SCHEMA)


# --- golden: test_combineOverlaps (reference tests/test_data_cleaning.py:29-49)
def test_combine_overlaps_golden(spark):
    df = _to_spark(spark, fixtures.activity_overlap())
    out = combine_overlaps(df, value_col="value_num").toPandas()
    assert len(out) == 1
    dur_h = (out["local_end"] - out["local_start"]).iloc[0] / pd.Timedelta("1h")
    assert dur_h == 1.5
    assert out["value_num"].iloc[0] == 150.0
    assert out["duration"].iloc[0] == 90.0


# --- golden: test_combineOverlapSleep (reference tests/test_data_cleaning.py:8-27)
def test_combine_overlaps_sleep_golden(spark):
    pdf = fixtures.sleep_period_1_day_overlap()
    df = _to_spark(spark, pdf)
    out = combine_overlaps_sleep(df, value_col="value").toPandas()
    assert len(out) == 2
    asleep = out[out.value == "Asleep"]
    inbed = out[out.value == "InBed"]
    assert len(asleep) == 1 and len(inbed) == 1
    src = pdf[pdf.value == "Asleep"]
    assert asleep["local_start"].iloc[0] == src["local_start"].min()
    assert asleep["local_end"].iloc[0] == src["local_end"].max()


def test_sessionize_and_merge(spark):
    rows = []
    base = dt.datetime(2024, 1, 1)
    # u1: 3 events within 10min, then 2h gap, then 1 more
    for m in (0, 5, 10, 130):
        rows.append(("u1", base + dt.timedelta(minutes=m)))
    # u2: single event
    rows.append(("u2", base))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    df = spark.createDataFrame(pdf)
    out = sessionize(
        df, entity_col="user_id", start_col="ts", end_col=None, gap_minutes=30
    ).toPandas()
    u1 = out[out.user_id == "u1"].sort_values("ts")
    assert list(u1.session_id) == [1, 1, 1, 2]
    assert out[out.user_id == "u2"].session_id.tolist() == [1]

    # merge_intervals: [0,60] [30,90] [200,260] minutes → two islands
    iv = pd.DataFrame(
        {
            "user_id": ["u1"] * 3,
            "s": [base, base + dt.timedelta(minutes=30), base + dt.timedelta(minutes=200)],
            "e": [
                base + dt.timedelta(minutes=60),
                base + dt.timedelta(minutes=90),
                base + dt.timedelta(minutes=260),
            ],
        }
    )
    merged = merge_intervals(
        spark.createDataFrame(iv), entity_col="user_id", start_col="s", end_col="e"
    ).toPandas().sort_values("s")
    assert len(merged) == 2
    assert merged.iloc[0]["e"] - merged.iloc[0]["s"] == pd.Timedelta("90m")


# --- differential parity vs the reference's own pandas implementation ----
def _reference_cleaning():
    sys.path.insert(0, "/root/reference")
    try:
        from mhealth_feature_generation import data_cleaning  # type: ignore

        return data_cleaning
    except Exception:  # pragma: no cover
        return None


def _random_hk(seed: int, n: int, stages=None) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = dt.datetime(2023, 1, 1)
    starts = np.sort(rng.integers(0, 3000, size=n))
    rows = []
    for i, s in enumerate(starts):
        dur = int(rng.integers(10, 120))
        value = (
            str(rng.choice(stages))
            if stages
            else str(float(np.round(rng.uniform(10, 200), 1)))
        )
        rows.append(
            dict(
                user_id="test",
                local_start=base + dt.timedelta(minutes=int(s)),
                local_end=base + dt.timedelta(minutes=int(s) + dur),
                type="ActiveEnergyBurned" if not stages else "SleepAnalysis",
                value=value,
            )
        )
    pdf = pd.DataFrame(rows)
    pdf["value_num"] = pd.to_numeric(pdf["value"], errors="coerce")
    pdf["timezone"] = "UTC"
    pdf["device_name"] = "Apple Watch"
    pdf["quantity_count"] = 1
    return pdf


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_combine_overlaps_differential(seed):
    ref = _reference_cleaning()
    if ref is None:
        pytest.skip("reference not importable")
    pdf = _random_hk(seed, n=25)
    ref_in = pdf.rename(columns={"value_num": "valnum"}).copy()
    ref_in["valnum"] = pdf["value_num"]
    expected = ref.combineOverlaps(ref_in, "valnum")
    got = _combine_overlaps_pdf(pdf, "value_num")
    assert len(got) == len(expected)
    np.testing.assert_allclose(
        np.sort(got["value_num"].to_numpy(dtype=float)),
        np.sort(expected["valnum"].to_numpy(dtype=float)),
        rtol=1e-12,
    )
    assert sorted(got["local_start"]) == sorted(expected["local_start"])
    assert sorted(got["local_end"]) == sorted(expected["local_end"])


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_combine_overlaps_sleep_differential(seed):
    ref = _reference_cleaning()
    if ref is None:
        pytest.skip("reference not importable")
    stages = ["InBed", "Asleep", "AsleepCore", "AsleepDeep", "AsleepREM", "Awake"]
    pdf = _random_hk(seed + 100, n=25, stages=stages)
    expected = ref.combineOverlapsSleep(pdf.copy(), "value")
    got = _combine_overlaps_sleep_pdf(pdf, "value")
    assert len(got) == len(expected)
    assert sorted(got["value"]) == sorted(expected["value"])
    assert sorted(got["local_start"]) == sorted(expected["local_start"])
    assert sorted(got["local_end"]) == sorted(expected["local_end"])
