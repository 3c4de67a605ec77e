"""Canonical schemas for the engine.

The reference enforces its event schema at load time
(``/root/reference/mhealth_feature_generation/dataloader.py:74-87``);
here the schemas are first-class ``StructType`` contracts.

Design choices vs the reference:

- ``local_start``/``local_end`` are ``TimestampNTZType`` — tz-naive local
  wall-clock, immune to session-timezone renormalization.
- the reference's stringly-typed ``value`` column (cast with
  ``.astype(float)`` inside every operator, e.g.
  ``simple_features.py:265,877``) is pre-split once into ``value`` (raw
  string, carries categorical sleep stages) + ``value_num``
  (``try_cast`` double) so each operator states which face it consumes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- HealthKit-shaped interval-event table (reference dataloader.py:74-87) ---
HK_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("local_start", T.TimestampNTZType(), False),
        T.StructField("local_end", T.TimestampNTZType(), False),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("type", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("value_num", T.DoubleType(), True),
        T.StructField("device_name", T.StringType(), True),
        T.StructField("quantity_count", T.IntegerType(), True),
    ]
)

# --- point-in-time feature requests (generate_features.py:49-161 keys) ---
REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.LongType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("lookback_hours", T.DoubleType(), False),
    ]
)

# --- pre-tokenized training-sequence table (BASELINE.json input_hint) ---
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# Required column names (reference dataloader.py:74-80)
HK_REQUIRED_COLUMNS = ["user_id", "local_start", "local_end", "timezone", "type"]

# Categorical domains — reference simple_features.py:25-50 (verbatim)
IN_BED_CATEGORIES = [
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
ASLEEP_CATEGORIES = [
    "Asleep",
    "AsleepUnspecified",
    "AwakeUnspecified",
    "CategoryValueUnknown",
    "AsleepCore",
    "AsleepDeep",
    "AsleepREM",
]
# local `awake` list inside dailySleepFeatures (simple_features.py:285)
AWAKE_CATEGORIES = ["Awake", "AwakeUnspecified"]
ACTIVITY_SAMPLE_TYPES = [
    "StepCount",
    "AppleExerciseTime",
    "ActiveEnergyBurned",
    "BasalEnergyBurned",
]
# Physiological plausibility ranges — generate_features.py:84-100
VITAL_RANGES = {
    "HeartRate": (30.0, 200.0),
    "HeartRateVariabilitySDNN": (0.0, 1.0),
    "OxygenSaturation": (0.5, 1.0),
    "RespiratoryRate": (0.1, 100.0),
}


def validate_hk_schema(df) -> None:
    """Raise if the canonical HK columns are missing (dataloader.py:74-87)."""
    missing = [c for c in HK_REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"HealthKit event table missing columns: {missing}")
