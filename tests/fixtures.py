"""Reference test fixtures synthesized in code (FIXTURES.md transcription
of /root/reference/tests/*.xlsx — no openpyxl dependency)."""

from __future__ import annotations

import pandas as pd


def _frame(rows: list[dict]) -> pd.DataFrame:
    pdf = pd.DataFrame(rows)
    pdf["local_start"] = pd.to_datetime(pdf["local_start"])
    pdf["local_end"] = pd.to_datetime(pdf["local_end"])
    if "value_num" not in pdf:
        pdf["value_num"] = pd.to_numeric(pdf["value"], errors="coerce")
    for col, default in [
        ("timezone", "America/Los_Angeles"),
        ("device_name", None),
        ("quantity_count", None),
    ]:
        if col not in pdf:
            pdf[col] = default
    return pdf


def sleep_period_2_days() -> pd.DataFrame:
    """sheet 1_sleep_period_2_days: two identical clean nights."""
    rows = []
    for d in (1, 2):
        rows += [
            dict(user_id="test", local_start=f"2023-01-0{d} 22:00",
                 local_end=f"2023-01-0{d} 23:00", type="SleepAnalysis", value="InBed"),
            dict(user_id="test", local_start=f"2023-01-0{d+1} 02:00",
                 local_end=f"2023-01-0{d+1} 06:00", type="SleepAnalysis", value="Asleep"),
            dict(user_id="test", local_start=f"2023-01-0{d+1} 01:00",
                 local_end=f"2023-01-0{d+1} 02:00", type="SleepAnalysis", value="Awake"),
        ]
    return _frame(rows)


def sleep_period_1_day_overlap() -> pd.DataFrame:
    """sheet 1_sleep_period_1_day_overlap: overlapping Asleep rows."""
    return _frame(
        [
            dict(user_id="test", local_start="2023-01-01 22:00",
                 local_end="2023-01-02 06:00", type="SleepAnalysis", value="InBed"),
            dict(user_id="test", local_start="2023-01-02 02:00",
                 local_end="2023-01-02 06:00", type="SleepAnalysis", value="Asleep"),
            dict(user_id="test", local_start="2023-01-02 03:00",
                 local_end="2023-01-02 07:00", type="SleepAnalysis", value="Asleep"),
        ]
    )


def sleep_period_fragmented() -> pd.DataFrame:
    """sheet 2_sleep_period_1_day: fragmented night (WASO)."""
    return _frame(
        [
            dict(user_id="test", local_start="2023-01-01 22:00",
                 local_end="2023-01-01 23:00", type="SleepAnalysis", value="InBed"),
            dict(user_id="test", local_start="2023-01-02 02:00",
                 local_end="2023-01-02 06:00", type="SleepAnalysis", value="Asleep"),
            dict(user_id="test", local_start="2023-01-02 06:00",
                 local_end="2023-01-02 07:00", type="SleepAnalysis", value="Awake"),
            dict(user_id="test", local_start="2023-01-02 07:00",
                 local_end="2023-01-02 08:00", type="SleepAnalysis", value="Asleep"),
        ]
    )


def activity_overlap() -> pd.DataFrame:
    """sheet 2_activity_overlap: two overlapping 1h@100 energy intervals."""
    return _frame(
        [
            dict(user_id="test", local_start="2023-01-01 10:00",
                 local_end="2023-01-01 11:00", type="ActiveEnergyBurned",
                 value="100", device_name="Apple Watch", quantity_count=1),
            dict(user_id="test", local_start="2023-01-01 10:30",
                 local_end="2023-01-01 11:30", type="ActiveEnergyBurned",
                 value="100", device_name="Apple Watch", quantity_count=1),
        ]
    )


def heart_rate_2_days() -> pd.DataFrame:
    """sheet 6_heart_rate: point samples across 2 days."""
    rows = [
        ("2023-01-01 10:00", "50"),
        ("2023-01-01 10:30", "50"),
        ("2023-01-01 10:31", "50"),
        ("2023-01-01 10:32", "100"),
        ("2023-01-01 10:33", "100"),
        ("2023-01-01 10:34", "100"),
        ("2023-01-02 10:34", "100"),
    ]
    return _frame(
        [
            dict(user_id="test", local_start=ts, local_end=ts,
                 type="HeartRate", value=v)
            for ts, v in rows
        ]
    )


def hr_context() -> pd.DataFrame:
    """sheet 1_test_hr_context: HR samples inside/outside sleep & activity."""
    return _frame(
        [
            dict(user_id="test", local_start="2023-01-01 22:00",
                 local_end="2023-01-01 23:00", type="SleepAnalysis", value="InBed"),
            dict(user_id="test", local_start="2023-01-02 02:00",
                 local_end="2023-01-02 06:00", type="SleepAnalysis", value="Asleep"),
            dict(user_id="test", local_start="2023-01-02 06:00",
                 local_end="2023-01-02 07:00", type="SleepAnalysis", value="Awake"),
            dict(user_id="test", local_start="2023-01-02 07:00",
                 local_end="2023-01-02 08:00", type="SleepAnalysis", value="Asleep"),
            dict(user_id="test", local_start="2023-01-01 10:00",
                 local_end="2023-01-01 11:00", type="AppleExerciseTime",
                 value="60", device_name="Apple Watch", quantity_count=1),
            dict(user_id="test", local_start="2023-01-02 03:00",
                 local_end="2023-01-02 03:00", type="HeartRate", value="40"),
            dict(user_id="test", local_start="2023-01-01 10:30",
                 local_end="2023-01-01 10:30", type="HeartRate", value="100"),
            dict(user_id="test", local_start="2023-01-03 03:00",
                 local_end="2023-01-03 03:00", type="HeartRate", value="75"),
        ]
    )


def audio_exposure() -> pd.DataFrame:
    """test_environment_data.xlsx audio_exposure: dup + overlapping rows."""
    rows = []
    for _ in range(5):
        rows.append(
            dict(user_id="test", local_start="2023-12-12 15:24:16",
                 local_end="2023-12-12 15:25:16",
                 type="EnvironmentalAudioExposure", value="50",
                 quantity_count=1, device_name="Apple Watch")
        )
    for _ in range(3):
        rows.append(
            dict(user_id="test", local_start="2023-12-12 17:13:29",
                 local_end="2023-12-12 17:43:29",
                 type="EnvironmentalAudioExposure", value="80",
                 quantity_count=100, device_name="Apple Watch")
        )
    return _frame(rows)
