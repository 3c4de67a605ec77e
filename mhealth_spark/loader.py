"""Ingest (SURVEY §2.1 S1-S6): suffix-dispatched load → normalized event
table, reimplementing ``/root/reference/mhealth_feature_generation/
dataloader.py`` as native Spark readers + expressions.

The reference's slowest path — per-row ``apply`` timezone conversion
(dataloader.py:216-227) — becomes a vectorized ``from_utc_timestamp``
with the per-day dominant timezone attached by a nearest as-of fill (J4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mhealth_spark.asof import nearest_fill_daily
from mhealth_spark.schema import validate_hk_schema

TYPE_PREFIXES = [
    "HKQuantityTypeIdentifier",
    "HKCategoryTypeIdentifier",
    "HKDataType",
]


def load_data(spark: SparkSession, path: str, default_tz: str = "UTC") -> DataFrame:
    """S1: dispatch on suffix → normalized HK event table
    (dataloader.py:18-88)."""
    if path.endswith(".csv"):
        df = load_csv(spark, path)
    elif path.endswith(".parquet") or not path.endswith(".xml"):
        df = spark.read.parquet(path)
    else:
        raise NotImplementedError(
            "XML export parsing needs spark-xml on the cluster; "
            "convert to parquet/CSV for this environment"
        )
    return normalize_events(df, default_tz=default_tz)


def load_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: CSV with header + ISO8601 timestamp parse (dataloader.py:101-125)."""
    df = spark.read.csv(path, header=True, inferSchema=False)
    for c in ("local_start", "local_end"):
        if c in df.columns:
            df = df.withColumn(c, F.to_timestamp(c).cast("timestamp_ntz"))
    return df


def parse_device_name(col) -> F.Column:
    """S4 (dataloader.py:170-176): extract name from
    '<<HKDevice...>, name:Apple Watch, ...' strings."""
    return F.regexp_replace(F.split(col, ", ")[1], "name:", "")


def normalize_events(df: DataFrame, default_tz: str = "UTC") -> DataFrame:
    """S1 body: coalesce quantity/category values, strip HK prefixes,
    snake→camel types, validate schema (dataloader.py:47-87)."""
    cols = df.columns
    # value coalesce: body.quantity.value | body.category.value → value
    if "value" not in cols:
        candidates = [c for c in ["body.quantity.value", "body.category.value"]
                      if c in cols]
        if candidates:
            # stringly-typed polymorphic value column (reference semantics);
            # casting both sides avoids ANSI double-coercion on categories
            df = df.withColumn(
                "value",
                F.coalesce(*[F.col(f"`{c}`").cast("string") for c in candidates]),
            )
    if "device.name" in cols and "device_name" not in cols:
        df = df.withColumn("device_name", F.col("`device.name`"))
    if "body.quantity.count" in cols and "quantity_count" not in cols:
        df = df.withColumn(
            "quantity_count", F.col("`body.quantity.count`").cast("int")
        )
    # strip HK prefixes from type and snake→camel
    t = F.col("type")
    for p in TYPE_PREFIXES:
        t = F.regexp_replace(t, p, "")
    # snake_case → CamelCase: split on _, initcap each, join
    t = F.concat_ws(
        "", F.transform(F.split(t, "_"), lambda w: F.initcap(w))
    )
    df = df.withColumn("type", t)
    if "value" in df.columns:
        df = df.withColumn("value", F.col("value").cast("string")).withColumn(
            "value_num", F.expr("try_cast(value AS double)")
        )
    if "timezone" not in df.columns:
        df = df.withColumn("timezone", F.lit(default_tz))
    validate_hk_schema(df)
    return df


def add_local_time(
    df: DataFrame,
    ts_col: str = "utc_start",
    default_tz: str = "UTC",
) -> DataFrame:
    """S5/J4 (dataloader.py:178-229): per-day dominant timezone,
    nearest-filled across days, then vectorized UTC→local conversion.

    One window pass for the dominant tz (mode per user-day), the J4
    nearest as-of fill for gap days, then ``from_utc_timestamp`` — no
    per-row Python anywhere.
    """
    with_day = df.withColumn("_d", F.to_date(ts_col))
    mode_tz = (
        with_day.filter(F.col("timezone").isNotNull())
        .groupBy("user_id", "_d", "timezone")
        .count()
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "_d").orderBy(
                    F.col("count").desc(), F.col("timezone")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "_d", F.col("timezone").alias("_tz"))
    )
    filled = nearest_fill_daily(
        mode_tz, entity_col="user_id", date_col="_d", value_col="_tz"
    )
    out = (
        with_day.drop("timezone")
        .join(filled, ["user_id", "_d"], "left")
        .withColumn("timezone", F.coalesce("_tz", F.lit(default_tz)))
        .drop("_tz", "_d")
    )
    for c_src, c_dst in [(ts_col, "local_start")]:
        out = out.withColumn(
            c_dst,
            F.from_utc_timestamp(F.col(c_src).cast("timestamp"), F.col("timezone"))
            .cast("timestamp_ntz"),
        )
    return out


def load_multi_sensor(
    spark: SparkSession, paths: list[str], user_id: str | None = None
) -> DataFrame:
    """S6 (dataloader.py:232-250): per-sensor file scan + union
    (allowMissingColumns mirrors pandas concat alignment)."""
    frames = []
    for p in paths:
        d = load_csv(spark, p) if p.endswith(".csv") else spark.read.parquet(p)
        if user_id is not None:
            d = d.withColumn("user_id", F.lit(user_id))
        frames.append(d)
    out = frames[0]
    for d in frames[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
