"""Ad-hoc per-query benchmark (bench.py is FROZEN for measurement; this
file exists so optimization work can time individual queries with
repeats without touching the driver's clock).

Usage:
    python bench_extra.py [--repeats N] [--sf DIR] [query ...]

With no query names, runs the full registry once (same order as
bench.py). Prints one JSON line per query: name, per-repeat seconds,
min. Methodology matches bench.py exactly: cold build + noop-sink
execution on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mhealth_spark.queries import QUERIES  # noqa: E402
from mhealth_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    if args.repeats < 1:
        raise SystemExit("--repeats must be >= 1")
    names = list(dict.fromkeys(args.queries)) or list(QUERIES)
    bad = [n for n in names if n not in QUERIES]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")

    results: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = samples
        print(json.dumps({"query": name, "samples": samples, "min": min(samples)}), flush=True)

    total_min = round(sum(min(s) for s in results.values()), 3)
    print(json.dumps({"total_min": total_min, "n": len(results)}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf": args.sf, "cpus": cpus, "repeats": args.repeats, "results": results}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
