"""Benchmark harness — prints ONE JSON line.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32).
Each query is forced end-to-end with the noop sink (full row
materialization JVM-side, no driver collect).

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "rows_per_sec": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mhealth_spark.queries import QUERIES  # noqa: E402
from mhealth_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_hourly_daily_stats",
    "j6_backfill_24h",
    "sessionize_gap30",
    "a1_stats_corrected",
    "w1_lag_lead",
    "i_merge_islands",
    "j2_interval_semi",
    "j4_nearest_fill",
]


def _force(df) -> int:
    """Materialize every row JVM-side; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 32)
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    extra = [
        n
        for n in QUERIES
        if n not in names
        and n.startswith(("dedup", "ann", "text", "corpus", "tokens", "similarity"))
    ]
    names += extra

    timings: dict[str, float] = {}
    rows_per_sec: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        # warm the IO cache/plan once at tiny cost? No — single cold run,
        # matching how the driver measures.
        t0 = time.time()
        _force(df)
        dt = time.time() - t0
        timings[name] = round(dt, 3)
    total = round(sum(timings.values()), 3)

    # north-rule metric: entity×timestamp feature-vector rows/sec for the
    # point-in-time backfill job (the flagship as-of pipeline)
    try:
        dfj = QUERIES["j6_backfill_24h"](spark, sf_dir)
        n_req = dfj.count()
        rows_per_sec["j6_feature_rows_per_sec"] = round(
            n_req / timings["j6_backfill_24h"], 1
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "headline query wall time (noop sink, cold)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "rows_per_sec": rows_per_sec,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
