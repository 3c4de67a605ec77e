"""Property-based differential tests (hypothesis): the engine's core
join/session semantics vs brute-force Python references on randomized
inputs — shrinkable counterexamples for the invariants the fixed-seed
goldens can't sweep.

Kept deliberately small (max_examples, tiny frames): each example runs a
real Spark job, so the value is shrinkability and input diversity, not
volume. deadline=None because JVM scheduling jitter would flake any
per-example time bound.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

# events: (entity in 2, minute offset 0..300, value 1..50)
_events = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=25,
)
_requests = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=300),
    ),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events, requests=_requests)
def test_point_in_time_join_matches_bruteforce(spark, events, requests):
    """For every (entity, request ts): aggregates over exactly the events
    with ts <= request_ts and ts > request_ts - lookback — never a future
    event (the leakage guard), never a too-old one."""
    from mhealth_spark.asof import point_in_time_join

    lookback_h = 1.0
    ev = spark.createDataFrame(
        [(u, BASE + dt.timedelta(minutes=m), float(v)) for u, m, v in events],
        ["user_id", "ts", "value"],
    )
    rq = spark.createDataFrame(
        [(u, BASE + dt.timedelta(minutes=m)) for u, m in requests],
        ["user_id", "ts"],
    )
    got = {
        (r.user_id, r.ts): (r.n, r.s)
        for r in point_in_time_join(
            ev,
            rq,
            agg_exprs=[
                F.count(F.col("e.value")).alias("n"),
                F.sum(F.col("e.value")).alias("s"),
            ],
            entity_col="user_id",
            event_ts="ts",
            request_ts="ts",
            lookback_hours=lookback_h,
            request_keys=["user_id", "ts"],
        ).collect()
    }
    for u, m in requests:
        rts = BASE + dt.timedelta(minutes=m)
        window = [
            float(v)
            for (eu, em, v) in events
            if eu == u
            and BASE + dt.timedelta(minutes=em) <= rts
            and (rts - BASE - dt.timedelta(minutes=em)).total_seconds()
            < lookback_h * 3600
        ]
        n, s = got[(u, rts)]
        assert n == len(window), (u, m, got[(u, rts)], window)
        assert (s or 0.0) == sum(window)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_sessionize_matches_bruteforce(spark, events):
    """Sessions break exactly where the gap from the running max end
    exceeds the threshold; session ids are dense and ordered per entity."""
    from mhealth_spark.intervals import sessionize

    gap_min = 30.0
    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(minutes=m)) for u, m, _ in events],
        ["user_id", "local_start"],
    )
    got = (
        sessionize(df, end_col=None, gap_minutes=gap_min)
        .toPandas()
        .sort_values(["user_id", "local_start"])
        .reset_index(drop=True)
    )
    # brute force: sort per entity, break when delta > gap
    exp_rows = []
    frame = pd.DataFrame(
        [(u, BASE + dt.timedelta(minutes=m)) for u, m, _ in events],
        columns=["user_id", "local_start"],
    ).sort_values(["user_id", "local_start"])
    for u, grp in frame.groupby("user_id"):
        sid = 0
        prev = None
        for t in grp["local_start"]:
            if prev is None or (t - prev).total_seconds() / 60.0 > gap_min:
                sid += 1
            prev = max(prev, t) if prev is not None else t
            exp_rows.append((u, t, sid))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "local_start", "sid"])
    exp = exp.sort_values(["user_id", "local_start"]).reset_index(drop=True)
    assert (got["user_id"] == exp["user_id"]).all()
    assert (got["session_id"].to_numpy() == exp["sid"].to_numpy()).all()
