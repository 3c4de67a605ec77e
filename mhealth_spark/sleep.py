"""Sleep-session features (SURVEY §2.6 A2/A3/A4/A7) — the reference's
largest semantics surface (``simple_features.py:237-494,605-695``),
re-expressed as ONE conditional aggregation per (entity, 3pm-day bin)
instead of six pandas resample passes + iterrows interval joins.

Quirks preserved (each golden-tested):

- per-entity dynamic origin: first sleep row's date @ 15:00; bins extend
  BACKWARD for rows before the origin (pandas resample origin semantics).
- "offset" = the end of the LAST row in start-order (not max end).
- firstAwakeDuration counts only an awake period strictly between bedrest
  onset and sleep onset, else 0.
- bedrestOnset clamped down to sleepOnset / bedrestOffset clamped up to
  sleepOffset (cross-category sanity).
- sleepEfficiency: 0 → null, > 1 → 1, and bedrest==0 & sleep>0 → 1
  (pandas inf clamps to 1).
- duration sums are ZERO inside a category's observed bin range but NULL
  outside it (pandas concat-of-resampled-series semantics).
- reported ``date`` = bin start + 1 day; hours are 15 + offset from bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from mhealth_spark.buckets import duration_hours
from mhealth_spark.intervals import combine_overlaps_sleep
from mhealth_spark.schema import (
    ASLEEP_CATEGORIES,
    AWAKE_CATEGORIES,
    IN_BED_CATEGORIES,
)

SECONDS_PER_DAY = 86400


def _noon_bin(ts_col, origin_col):
    """origin + floor((ts - origin)/1d) days, via epoch-microsecond math."""
    delta = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.col(origin_col).cast("timestamp")
    )
    idx = F.floor(delta / (SECONDS_PER_DAY * 1_000_000))
    return (
        F.timestamp_micros(
            F.unix_micros(F.col(origin_col).cast("timestamp"))
            + idx * SECONDS_PER_DAY * 1_000_000
        ).cast("timestamp_ntz")
    )


def prepare_sleep(hk: DataFrame) -> DataFrame:
    """Filter/dedup/overlap-combine SleepAnalysis rows and attach the
    per-entity 3pm-anchored day bin (reference simple_features.py:249-284)."""
    sleep = (
        hk.filter(F.col("type") == "SleepAnalysis")
        .select("user_id", "local_start", "local_end", "value", "type")
        .dropDuplicates()
    )
    sleep = combine_overlaps_sleep(sleep, value_col="value").dropDuplicates()
    sleep = sleep.withColumn(
        "value", F.regexp_replace("value", "HKCategoryValueSleepAnalysis", "")
    ).withColumn("dur_h", duration_hours())
    w = Window.partitionBy("user_id")
    origin = F.date_trunc("DAY", F.min("local_start").over(w)) + F.expr(
        "INTERVAL 15 HOURS"
    )
    sleep = sleep.withColumn("origin", origin)
    return sleep.withColumn("bin", _noon_bin("local_start", "origin"))


def daily_sleep_features(hk: DataFrame, qc: bool = True) -> DataFrame:
    """A3: per-night sleep feature vector keyed (user_id, date)."""
    sleep = prepare_sleep(hk)

    in_bed = F.col("value").isin(IN_BED_CATEGORIES)
    asleep = F.col("value").isin(ASLEEP_CATEGORIES)
    awake = F.col("value").isin(AWAKE_CATEGORIES)
    st, en, dur = F.col("local_start"), F.col("local_end"), F.col("dur_h")

    agg = sleep.groupBy("user_id", "bin").agg(
        F.min(F.when(in_bed, st)).alias("bedrestOnset"),
        F.max(F.when(in_bed, F.struct(st.alias("s"), en.alias("e")))).alias("_ibl"),
        F.sum(F.when(in_bed, dur)).alias("bedrestDuration"),
        F.min(F.when(asleep, st)).alias("sleepOnset"),
        F.max(F.when(asleep, F.struct(st.alias("s"), en.alias("e")))).alias("_asl"),
        F.sum(F.when(asleep, dur)).alias("sleepDuration"),
        F.sum(F.when(awake, dur)).alias("awakeDuration"),
        F.min(F.when(awake, F.struct(st.alias("s"), dur.alias("d")))).alias("_fa"),
    )
    agg = (
        agg.withColumn("bedrestOffset", F.col("_ibl.e"))
        .withColumn("sleepOffset", F.col("_asl.e"))
        .withColumn("_fa_start", F.col("_fa.s"))
        .withColumn("_fa_dur", F.col("_fa.d"))
        .drop("_ibl", "_asl", "_fa")
    )

    # --- bin spine: union of each category's continuous bin range --------
    day_us = SECONDS_PER_DAY * 1_000_000
    ranges = sleep.groupBy("user_id").agg(
        F.min(F.when(in_bed, F.col("bin"))).alias("ib0"),
        F.max(F.when(in_bed, F.col("bin"))).alias("ib1"),
        F.min(F.when(asleep, F.col("bin"))).alias("as0"),
        F.max(F.when(asleep, F.col("bin"))).alias("as1"),
        F.min(F.when(awake, F.col("bin"))).alias("aw0"),
        F.max(F.when(awake, F.col("bin"))).alias("aw1"),
    )

    def seq(a, b):
        return F.when(
            F.col(a).isNotNull(),
            F.sequence(
                F.unix_micros(F.col(a).cast("timestamp")),
                F.unix_micros(F.col(b).cast("timestamp")),
                F.lit(day_us),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    spine = (
        ranges.withColumn(
            "_bins",
            F.array_distinct(
                F.concat(seq("ib0", "ib1"), seq("as0", "as1"), seq("aw0", "aw1"))
            ),
        )
        .select(
            "user_id",
            "ib0", "ib1", "as0", "as1", "aw0", "aw1",
            F.explode("_bins").alias("_bin_us"),
        )
        .withColumn("bin", F.timestamp_micros(F.col("_bin_us")).cast("timestamp_ntz"))
        .drop("_bin_us")
    )

    df = spine.join(agg, ["user_id", "bin"], "left")

    def in_range(lo, hi):
        return F.col("bin").between(F.col(lo), F.col(hi))

    # zero-fill duration sums inside the category's own range, null outside
    df = (
        df.withColumn(
            "bedrestDuration",
            F.when(in_range("ib0", "ib1"), F.coalesce("bedrestDuration", F.lit(0.0))),
        )
        .withColumn(
            "sleepDuration",
            F.when(in_range("as0", "as1"), F.coalesce("sleepDuration", F.lit(0.0))),
        )
        .withColumn(
            "awakeDuration",
            F.when(in_range("aw0", "aw1"), F.coalesce("awakeDuration", F.lit(0.0))),
        )
        .drop("ib0", "ib1", "as0", "as1", "aw0", "aw1")
    )

    # firstAwake gate (pre-clamp bounds) then fillna(0)
    df = df.withColumn(
        "firstAwakeDuration",
        F.coalesce(
            F.when(
                (F.col("_fa_start") > F.col("bedrestOnset"))
                & (F.col("_fa_start") < F.col("sleepOnset")),
                F.col("_fa_dur"),
            ),
            F.lit(0.0),
        ),
    ).drop("_fa_start", "_fa_dur")

    # cross-category clamps (simple_features.py:366-377)
    df = df.withColumn(
        "bedrestOnset",
        F.when(
            F.col("bedrestOnset") > F.col("sleepOnset"), F.col("sleepOnset")
        ).otherwise(F.col("bedrestOnset")),
    ).withColumn(
        "bedrestOffset",
        F.when(
            F.col("bedrestOffset") < F.col("sleepOffset"), F.col("sleepOffset")
        ).otherwise(F.col("bedrestOffset")),
    )

    # --- per-night vitals medians (A4): bucketized interval join nights ×
    # samples — the equi-join key is (user_id, time bucket) with the range
    # predicate inside the join condition, so no per-user nights×samples
    # cross product ever forms (the asof.interval_join shape; each
    # (sample, night) pair matches exactly once, in the sample's bucket).
    def night_median(types_col, lo, hi, out):
        from mhealth_spark.asof import DEFAULT_BUCKET_SECONDS, _epoch

        bucket_s = DEFAULT_BUCKET_SECONDS
        samples = (
            hk.filter(F.col("type") == types_col)
            .select(
                F.col("user_id").alias("_suid"),
                F.col("local_start").alias("_ts"),
                F.col("value_num").alias("_v"),
            )
            .withColumn("_b", F.floor(_epoch(F.col("_ts")) / bucket_s))
        )
        nights = df.select(
            "user_id", "bin", F.col(lo).alias("_lo"), F.col(hi).alias("_hi")
        ).withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(_epoch(F.col("_lo")) / bucket_s),
                    F.floor(_epoch(F.col("_hi")) / bucket_s),
                )
            ),
        )
        med = (
            nights.join(
                samples,
                (F.col("user_id") == F.col("_suid"))
                & (nights["_b"] == samples["_b"])
                & (F.col("_ts") >= F.col("_lo"))
                & (F.col("_ts") <= F.col("_hi")),
            )
            .groupBy("user_id", "bin")
            .agg(F.median("_v").alias(out))
        )
        return med

    hr_med = night_median("HeartRate", "sleepOnset", "sleepOffset", "sleepHR")
    hrv_med = night_median(
        "HeartRateVariabilitySDNN", "sleepOnset", "sleepOffset", "sleepHRV"
    )
    noise_med = night_median(
        "EnvironmentalAudioExposure", "bedrestOnset", "bedrestOffset", "bedrestNoise"
    )
    df = (
        df.join(hr_med, ["user_id", "bin"], "left")
        .join(hrv_med, ["user_id", "bin"], "left")
        .join(noise_med, ["user_id", "bin"], "left")
    )

    # --- derived features -------------------------------------------------
    hours_from_bin = lambda c: 15.0 + (
        F.unix_micros(F.col(c).cast("timestamp"))
        - F.unix_micros(F.col("bin").cast("timestamp"))
    ) / 3.6e9

    eff = (
        F.when(
            (F.col("bedrestDuration") == 0) & (F.col("sleepDuration") > 0), F.lit(1.0)
        )
        .when(F.col("bedrestDuration") == 0, F.lit(None))
        .otherwise(F.col("sleepDuration") / F.col("bedrestDuration"))
    )
    df = (
        df.withColumn("wakeAfterSleepOnset",
                      F.col("awakeDuration") - F.col("firstAwakeDuration"))
        .withColumn("sleepEfficiency", eff)
        .withColumn(
            "sleepEfficiency",
            F.when(F.col("sleepEfficiency") == 0, F.lit(None))
            .when(F.col("sleepEfficiency") > 1, F.lit(1.0))
            .otherwise(F.col("sleepEfficiency")),
        )
        .withColumn(
            "sleepOnsetLatency",
            (
                F.unix_micros(F.col("sleepOnset").cast("timestamp"))
                - F.unix_micros(F.col("bedrestOnset").cast("timestamp"))
            ) / 3.6e9,
        )
        .withColumn("bedrestOnsetHours", hours_from_bin("bedrestOnset"))
        .withColumn("bedrestOffsetHours", hours_from_bin("bedrestOffset"))
        .withColumn("sleepOnsetHours", hours_from_bin("sleepOnset"))
        .withColumn("sleepOffsetHours", hours_from_bin("sleepOffset"))
        .withColumn("date", F.to_date(F.col("bin") + F.expr("INTERVAL 1 DAY")))
    )

    feature_cols = [
        "bedrestDuration",
        "sleepDuration",
        "awakeDuration",
        "sleepHR",
        "sleepHRV",
        "bedrestNoise",
        "wakeAfterSleepOnset",
        "sleepEfficiency",
        "sleepOnsetLatency",
        "bedrestOnsetHours",
        "bedrestOffsetHours",
        "sleepOnsetHours",
        "sleepOffsetHours",
    ]
    out = df.select(
        "user_id",
        "date",
        *[F.col(c).alias(f"sleep_{c}_day") for c in feature_cols],
    )
    if qc:
        out = qc_sleep_features(out)
    return out


def qc_sleep_features(data: DataFrame) -> DataFrame:
    """Q2 (simple_features.py:483-494): 0→null for efficiency/duration,
    Awake_sum > 20 → null."""
    for col, pred in [
        ("sleep_sleepEfficiency_day", F.col("sleep_sleepEfficiency_day") == 0),
        ("sleep_sleepDuration_day", F.col("sleep_sleepDuration_day") == 0),
        ("sleep_Awake_sum", F.col("sleep_Awake_sum") > 20),
    ]:
        if col in data.columns:
            data = data.withColumn(
                col, F.when(pred, F.lit(None)).otherwise(F.col(col))
            )
    return data


SLEEP_STAGES = [
    "InBed",
    "Asleep",
    "AsleepUnspecified",
    "CategoryValueUnknown",
    "Awake",
    "AwakeUnspecified",
    "AsleepCore",
    "AsleepDeep",
    "AsleepREM",
]

SLEEP_CAT_STATS = ["sum", "mean", "count"]


def aggregate_sleep_categories(
    hk: DataFrame,
    group_cols: list[str] | None = None,
    qc: bool = True,
    pre_bucketed: bool = False,
) -> DataFrame:
    """A2/P1 (simple_features.py:640-695): per-stage duration stats pivoted
    wide as ``sleep_{Stage}_{sum|mean|count}`` (sum/mean in hours).

    ``group_cols`` extends the key (e.g. ["user_id", "bin"] for the daily
    variant, where overlap-combining runs within each bucket —
    ``pre_bucketed=True`` keeps the kernel grouped that way, matching
    ``aggregateSleepCategoriesDaily``'s per-day apply).
    """
    keys = group_cols or ["user_id"]
    if not pre_bucketed:
        sleep = (
            hk.filter(F.col("type") == "SleepAnalysis")
            .select(*keys, "local_start", "local_end", "value", "type")
        )
        sleep = combine_overlaps_sleep(sleep, value_col="value", group_cols=tuple(keys))
    else:
        sleep = hk
    sleep = sleep.withColumn("dur_h", duration_hours())
    agg = sleep.groupBy(*keys).pivot("value", SLEEP_STAGES).agg(
        F.sum("dur_h").alias("sum"),
        F.mean("dur_h").alias("mean"),
        F.count("dur_h").cast("double").alias("count"),
    )
    # normalize names: "{stage}_{stat}" → "sleep_{stage}_{stat}"
    renames = {}
    for stage in SLEEP_STAGES:
        for stat in SLEEP_CAT_STATS:
            src = f"{stage}_{stat}"
            if src in agg.columns:
                renames[src] = f"sleep_{stage}_{stat}"
    out = agg.withColumnsRenamed(renames)
    if qc:
        out = qc_sleep_features(out)
    return out


def aggregate_daily_sleep(
    hk: DataFrame,
    sleep_features: list[str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A7 (simple_features.py:605-637): multi-day stats over the daily
    sleep features → one wide row per group: ``{feature}_{stat}`` plus
    sleep_sleep_day_count / sleep_bedrest_day_count."""
    keys = group_cols or ["user_id"]
    daily = daily_sleep_features(hk)
    feats = sleep_features or [
        c for c in daily.columns if c not in ("user_id", "date")
    ]
    aggs = []
    for c in feats:
        col = F.col(c)
        aggs += [
            F.mean(col).alias(f"{c}_mean"),
            F.median(col).alias(f"{c}_median"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            F.stddev_samp(col).alias(f"{c}_std"),
        ]
    aggs += [
        F.count("sleep_sleepDuration_day").cast("double").alias("sleep_sleep_day_count"),
        F.count("sleep_bedrestDuration_day").cast("double").alias("sleep_bedrest_day_count"),
    ]
    return daily.groupBy(*keys).agg(*aggs)
