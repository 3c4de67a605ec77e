"""Watch-wear coverage (SURVEY §2.5 R6/R7, reference
``simple_features.py:171-234``, ``simple_features_daily.py:89-121``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hour_bin_from(ts_col, origin_col):
    """floor((ts - origin)/1h) — origin-anchored hourly bucket index."""
    return F.floor(
        (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(F.col(origin_col).cast("timestamp"))
        )
        / 3.6e9
    )


def watch_on_stats(
    hk: DataFrame,
    origin_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """R6: per group, % and count of origin-anchored hourly bins containing
    >=1 Apple-Watch HeartRate row. ``origin_col``/``end_col`` are columns
    (per-request window bounds). Denominator = floor((end-origin)/1h)+1,
    matching pandas ``date_range(origin, end, freq="1h").shape[0]``.
    Groups with no watch HR rows are absent (callers fill 0)."""
    keys = group_cols or ["user_id"]
    hr = hk.filter(
        (F.col("type") == "HeartRate")
        & F.coalesce(F.col("device_name").contains("Apple Watch"), F.lit(False))
    )
    n_bins = (
        F.floor(
            (
                F.unix_micros(F.max(end_col).cast("timestamp"))
                - F.unix_micros(F.max(origin_col).cast("timestamp"))
            )
            / 3.6e9
        )
        + 1
    )
    return hr.groupBy(*keys).agg(
        (100.0 * F.count_distinct(_hour_bin_from("local_start", origin_col)) / n_bins)
        .alias("watch_on_percent"),
        F.count_distinct(_hour_bin_from("local_start", origin_col))
        .cast("double")
        .alias("watch_on_hours"),
    )


def watch_on_hours_daily(hk: DataFrame) -> DataFrame:
    """R7 (simple_features_daily.py:89-121): hours-with-HR per day, with a
    DENSE daily spine per user (empty days between first and last HR day
    emit 0 — pandas resample semantics). No device filter (quirk of the
    daily variant)."""
    hr = hk.filter(F.col("type") == "HeartRate")
    per_day = (
        hr.groupBy("user_id", F.to_date("local_start").alias("date"))
        .agg(
            F.count_distinct(F.date_trunc("HOUR", "local_start"))
            .cast("double")
            .alias("watchOnHours_sum_day")
        )
    )
    spine = (
        per_day.groupBy("user_id")
        .agg(F.min("date").alias("_d0"), F.max("date").alias("_d1"))
        .select(
            "user_id", F.explode(F.sequence("_d0", "_d1")).alias("date")
        )
    )
    return spine.join(per_day, ["user_id", "date"], "left").fillna(
        {"watchOnHours_sum_day": 0.0}
    )
