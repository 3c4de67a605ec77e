"""Every driver query vs its DuckDB oracle at sf0.001 (the driver runs the
same comparison at sf0.01 — this is the fast in-repo replica)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracles import compare, duck_con  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF_DIR)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_oracle_parity(spark, duck, name):
    fn = entry_mod.queries()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
