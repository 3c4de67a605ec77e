"""Environmental-audio aggregation (SURVEY §2.6 A5, reference
``simple_features.py:534-602``): overlap-combine → optional context gate →
hourly-median bins over (count, duration, value) → wide summary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mhealth_spark.buckets import duration_hours
from mhealth_spark.intervals import combine_overlaps
from mhealth_spark.schema import ASLEEP_CATEGORIES, IN_BED_CATEGORIES


def aggregate_audio_exposure(
    hk: DataFrame,
    group_cols: list[str] | None = None,
    resample_hours: float = 1.0,
    context: str = "all",
    column_suffix: str = "",
) -> DataFrame:
    """A5: one wide row per group:
    ``{ctx}audioExposure_{hours,mean,count,entries}``."""
    keys = group_cols or ["user_id"]
    audio = hk.filter(F.col("type") == "EnvironmentalAudioExposure")
    dedup_keys = tuple(dict.fromkeys([*keys, "user_id", "type"]))
    combined = combine_overlaps(audio, value_col="value_num", group_cols=dedup_keys)
    combined = combined.withColumn("dur_h", duration_hours())

    context_str = ""
    if context != "all":
        cats = {"bedrest": IN_BED_CATEGORIES, "sleep": ASLEEP_CATEGORIES}
        if context not in cats:
            raise ValueError(f"Invalid context: {context}")
        periods = (
            hk.filter(
                (F.col("type") == "SleepAnalysis")
                & F.col("value").isin(cats[context])
            )
            .select(
                *keys,
                F.col("local_start").alias("_ps"),
                F.col("local_end").alias("_pe"),
            )
            .dropDuplicates()
        )
        a = combined.alias("a")
        p = periods.alias("p")
        cond = [F.col(f"a.{k}") == F.col(f"p.{k}") for k in keys] + [
            F.col("a.local_start") >= F.col("p._ps"),
            F.col("a.local_start") <= F.col("p._pe"),
        ]
        combined = a.join(p, cond, "inner").select("a.*")
        context_str = f"{context}_"

    bucket_s = int(resample_hours * 3600)
    binned = combined.groupBy(
        *keys,
        F.floor(
            F.unix_micros(F.col("local_start").cast("timestamp")) / (bucket_s * 1e6)
        ).alias("_b"),
    ).agg(
        F.median(F.col("quantity_count").cast("double")).alias("cnt_m"),
        F.median("dur_h").alias("dur_m"),
        F.median("value_num").alias("val_m"),
    )
    p = f"{context_str}audioExposure_"
    return binned.groupBy(*keys).agg(
        F.sum("dur_m").alias(f"{p}hours{column_suffix}"),
        F.mean("val_m").alias(f"{p}mean{column_suffix}"),
        F.sum("cnt_m").alias(f"{p}count{column_suffix}"),
        F.count("val_m").cast("double").alias(f"{p}entries{column_suffix}"),
    )
