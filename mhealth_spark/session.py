"""SparkSession factory with the engine's standard configuration.

Scale posture (tuned for a multi-executor cluster, exercised on
``local[N]`` in the sandbox):

- AQE on (coalescing, skew-join splitting) — runtime re-planning is the
  first line of defense against shuffle skew at 100 TB.
- Arrow on — every Python kernel crosses the JVM<->Python boundary in
  columnar batches, never row-at-a-time.
- Session timezone pinned to UTC and parquet timestamps read as NTZ so
  local-time semantics are explicit in the data, not the session.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mhealth_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback
    ``local[*]``) in the sandbox; on a real cluster, leave it unset and
    let ``spark-submit`` provide it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / parity ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # --- Arrow: all Python kernels are vectorized ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- AQE: runtime re-planning, skew-join splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # 128 MB input splits: at 100 TB this yields ~800k tasks, the
        # right granularity for a 1000-executor cluster.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # bucketed-layout tables (write_bucketed_layout) land here in the
        # sandbox; a real cluster's Hive/Glue catalog supplies its own.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR",
                os.path.join(tempfile.gettempdir(), "mhealth_spark_warehouse"),
            ),
        )
        .config("spark.ui.enabled", "false")
        # \r progress bars interleave with stdout lines and mangle every
        # log consumer (bench JSON tail, oracle-check greps)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``mhealth_spark`` importable on executors.

    Arrow kernels (applyInPandas closures) reference module attributes, so
    Python workers must import the package. On a real cluster this is
    ``spark-submit --py-files mhealth_spark.zip`` (see cli.py); here we
    ship the same zip via ``addPyFile`` so any entry point — driver
    harness, bench, tests — works regardless of cwd/PYTHONPATH.
    """
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        spark.sparkContext._jsc  # session alive
        zip_base = os.path.join(tempfile.gettempdir(), "mhealth_spark_pkg")
        zip_path = zip_base + ".zip"
        if not os.path.exists(zip_path):
            shutil.make_archive(
                zip_base, "zip", os.path.dirname(pkg_dir), "mhealth_spark"
            )
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # pragma: no cover - best effort on exotic deploys
        pass
