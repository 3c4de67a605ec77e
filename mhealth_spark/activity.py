"""Activity-duration aggregation (SURVEY §2.6 A6 + Q3, reference
``simple_features.py:497-531,714-786``): device/count filters → QC →
overlap-combine (I1 kernel) → tumbling sum bins → sum/mean/count stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mhealth_spark.buckets import duration_hours
from mhealth_spark.intervals import combine_overlaps
from mhealth_spark.schema import ACTIVITY_SAMPLE_TYPES

JOULES_PER_KCAL = 4184.0


def qc_activity(data: DataFrame, hk_type: str) -> DataFrame:
    """Q3 (simple_features.py:497-531). Quirk preserved: the reference uses
    ``.dt.seconds`` (seconds-of-day component, NOT total seconds) for the
    kcal/min denominator — multi-day intervals wrap."""
    data = data.dropDuplicates(["local_start", "local_end", "value_num"])
    if "EnergyBurned" in hk_type:
        # pandas .dt.seconds == seconds modulo days
        total_s = F.unix_micros(F.col("local_end").cast("timestamp")) - F.unix_micros(
            F.col("local_start").cast("timestamp")
        )
        mins = F.pmod(F.floor(total_s / 1e6), F.lit(86400)) / 60.0
        kcal_per_min = F.col("value_num") / mins
        v = (
            F.when(mins <= 0, F.lit(None))
            .when(kcal_per_min < 0, F.lit(None))
            .when(kcal_per_min > 30, F.lit(None))
            .otherwise(F.col("value_num"))
        )
    else:
        v = F.when(F.col("value_num") <= 0, F.lit(None)).otherwise(F.col("value_num"))
    return data.withColumn("value_num", v)


def aggregate_active_duration(
    hk: DataFrame,
    hk_type: str,
    group_cols: list[str] | None = None,
    qc: bool = True,
    device: str = "Apple Watch",
    aggregations: list[str] | None = None,
    resample_hours: float | None = 1.0,
    value_per_kcal: float = JOULES_PER_KCAL,
    column_suffix: str = "",
) -> DataFrame:
    """A6: one wide row per group with ``{type}_{sum,mean,count,duration}``.

    ``resample_hours=24.0`` reproduces the reference's ``resample="1D"``
    E1 setting; ``None`` skips binning (aggregate raw combined intervals).
    AppleExerciseTime drops its mean (simple_features.py:778-786).
    """
    if hk_type not in ACTIVITY_SAMPLE_TYPES:
        raise ValueError(f"Invalid hk_type: {hk_type}")
    keys = group_cols or ["user_id"]
    aggs = aggregations or ["sum", "mean", "count"]

    sel_cols = list(
        dict.fromkeys(
            [*keys, "local_start", "local_end", "value_num", "type", "user_id"]
        )
    )
    activity = (
        hk.filter(
            (F.col("type") == hk_type)
            & (F.col("device_name") == device)
            & (F.col("quantity_count") == 1)
        )
        .select(*sel_cols)
        .dropDuplicates()
    )
    if "EnergyBurned" in hk_type:
        activity = activity.withColumn("value_num", F.col("value_num") / value_per_kcal)
    if qc:
        activity = qc_activity(activity, hk_type).dropna(
            subset=["value_num"]
        ).dropDuplicates()

    dedup_keys = tuple(dict.fromkeys([*keys, "user_id", "type"]))
    combined = combine_overlaps(activity, value_col="value_num", group_cols=dedup_keys)
    combined = combined.withColumn("dur_h", duration_hours())

    if resample_hours is not None:
        bucket_s = int(resample_hours * 3600)
        binned = combined.groupBy(
            *keys,
            F.floor(
                F.unix_micros(F.col("local_start").cast("timestamp")) / (bucket_s * 1e6)
            ).alias("_b"),
        ).agg(
            F.sum("value_num").alias("v"),
            F.sum("dur_h").alias("dh"),
        )
    else:
        binned = combined.select(
            *keys, F.col("value_num").alias("v"), F.col("dur_h").alias("dh")
        )
    binned = binned.filter(F.col("dh") > 0)

    prefix = f"{hk_type}_"
    exprs = {
        "sum": F.sum("v"),
        "mean": F.mean("v"),
        "count": F.count("v").cast("double"),
    }
    out_aggs = [
        exprs[a].alias(f"{prefix}{a}{column_suffix}")
        for a in aggs
        if not (hk_type == "AppleExerciseTime" and a == "mean")
    ]
    out_aggs.append(F.sum("dh").alias(f"{prefix}duration{column_suffix}"))
    return binned.groupBy(*keys).agg(*out_aggs)
