"""Point-in-time machinery: correctness vs pandas merge_asof, and the
north_rule's zero-temporal-leakage property (perturbing FUTURE events
leaves every emitted feature unchanged)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mhealth_spark.asof import (
    interval_join,
    merge_asof_last,
    nearest_fill_daily,
    point_in_time_join,
)


def _events_pdf(seed=7, n=400, users=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n).astype(str),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in
                   np.sort(rng.integers(0, 14 * 86400, n))],
            "value": np.round(rng.uniform(1, 100, n), 3),
        }
    )
    return pdf


def _requests_pdf(seed=13, n=40, users=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 2)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n).astype(str),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in
                   np.sort(rng.integers(0, 12 * 86400, n))],
        }
    ).drop_duplicates()


def _pit_oracle(events, requests, lookback_h):
    out = []
    for _, r in requests.iterrows():
        lo = r.ts - dt.timedelta(hours=lookback_h)
        win = events[
            (events.user_id == r.user_id) & (events.ts > lo) & (events.ts <= r.ts)
        ]
        out.append(
            dict(
                user_id=r.user_id,
                ts=r.ts,
                n=len(win),
                s=win.value.sum() if len(win) else None,
            )
        )
    return pd.DataFrame(out)


def test_point_in_time_join_matches_bruteforce(spark):
    events, requests = _events_pdf(), _requests_pdf()
    got = (
        point_in_time_join(
            spark.createDataFrame(events),
            spark.createDataFrame(requests),
            agg_exprs=[
                F.count(F.col("e.value")).alias("n"),
                F.sum(F.col("e.value")).alias("s"),
            ],
            lookback_hours=36.0,
            request_keys=["user_id", "ts"],
        )
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    exp = (
        _pit_oracle(events, requests, 36.0)
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n"] == exp["n"]).all()
    np.testing.assert_allclose(
        got["s"].fillna(-1).to_numpy(), exp["s"].fillna(-1).astype(float).to_numpy(),
        rtol=1e-9,
    )


def test_zero_temporal_leakage(spark):
    """north_rule property: perturb all events strictly AFTER each request's
    ts — feature vectors at every entity×timestamp must be unchanged."""
    events, requests = _events_pdf(), _requests_pdf()
    cutoff = requests.ts.max()
    perturbed = events.copy()
    future = perturbed.ts > cutoff
    perturbed.loc[future, "value"] = perturbed.loc[future, "value"] * 1000 + 123.456
    # also inject brand-new future events
    inject = perturbed.tail(10).copy()
    inject["ts"] = cutoff + dt.timedelta(days=2)
    inject["value"] = 9e9
    perturbed = pd.concat([perturbed, inject], ignore_index=True)

    def run(ev):
        return (
            point_in_time_join(
                spark.createDataFrame(ev),
                spark.createDataFrame(requests),
                agg_exprs=[
                    F.count(F.col("e.value")).alias("n"),
                    F.sum(F.col("e.value")).alias("s"),
                    F.avg(F.col("e.value")).alias("m"),
                ],
                lookback_hours=48.0,
                request_keys=["user_id", "ts"],
            )
            .toPandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )

    a, b = run(events), run(perturbed)
    # per-request windows end at request ts; anything later is invisible
    mask = a.ts <= cutoff  # all requests
    assert mask.all()
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_merge_asof_last_matches_pandas(spark):
    events = _events_pdf(seed=3).rename(columns={"value": "v"})
    requests = _requests_pdf(seed=4)
    got = (
        merge_asof_last(
            spark.createDataFrame(requests),
            spark.createDataFrame(events),
            on_entity="user_id",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
        )
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        requests.sort_values("ts"),
        events.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got["v_asof"].fillna(-1).to_numpy(),
        exp["v"].fillna(-1).to_numpy(),
        rtol=1e-12,
    )


def test_interval_join_semi_anti_partition(spark):
    """semi(points) ∪ anti(points) == points, disjoint."""
    events = _events_pdf(seed=11)
    periods = (
        _events_pdf(seed=12)
        .head(30)
        .rename(columns={"ts": "period_start"})
        .drop(columns=["value"])
    )
    periods["period_end"] = periods["period_start"] + dt.timedelta(hours=2)
    pts = spark.createDataFrame(events)
    per = spark.createDataFrame(periods)
    semi = interval_join(pts, per, point_ts="ts", how="semi").toPandas()
    anti = interval_join(pts, per, point_ts="ts", how="anti").toPandas()
    assert len(semi) + len(anti) == len(events)
    # brute-force check of the semi side
    def covered(r):
        p = periods[periods.user_id == r.user_id]
        return ((p.period_start <= r.ts) & (r.ts <= p.period_end)).any()

    exp_n = sum(covered(r) for _, r in events.iterrows())
    assert len(semi) == exp_n


def test_nearest_fill_daily_matches_pandas(spark):
    rng = np.random.default_rng(5)
    days = pd.date_range("2024-01-01", periods=20).date
    rows = []
    for u in ["a", "b"]:
        obs = sorted(rng.choice(range(20), size=6, replace=False))
        for d in obs:
            rows.append(dict(user_id=u, d=days[d], v=float(rng.integers(1, 100))))
    daily = pd.DataFrame(rows)
    got = (
        nearest_fill_daily(
            spark.createDataFrame(daily), entity_col="user_id",
            date_col="d", value_col="v",
        )
        .toPandas()
        .sort_values(["user_id", "d"])
        .reset_index(drop=True)
    )
    for u in ["a", "b"]:
        sub = daily[daily.user_id == u]
        obs_days = np.array([d.toordinal() for d in sub.d])
        obs_vals = sub.v.to_numpy()
        lo, hi = obs_days.min(), obs_days.max()
        exp = []
        for d in range(lo, hi + 1):
            dist = np.abs(obs_days - d)
            # ties → earlier day (engine semantics: prefer previous)
            exp.append(obs_vals[np.argmin(dist)])
        g = got[got.user_id == u]["v"].to_numpy()
        np.testing.assert_allclose(g, np.array(exp))
