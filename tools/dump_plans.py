"""Dump ``explain("formatted")`` for registered queries to files.

Usage:
    python tools/dump_plans.py <outdir> <suffix> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each query (default: all).
Build side effects (localCheckpoint, persisted index writes) run at
sf0.001 so the dump is fast; the captured plan is the final probe plan,
the same convention as tests/test_plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhealth_spark.queries import QUERIES  # noqa: E402
from mhealth_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
