"""Interval algebra & gap-based sessionization (SURVEY §2.4).

Two tiers:

- **Idiomatic scale path** (native window functions, whole-stage codegen):
  ``sessionize`` (gap-break session ids via cumulative time-delta breaks,
  the north_rule wording) and ``merge_intervals`` (union of overlapping
  intervals via running-max island detection). These are what a new
  pipeline should use at 100 TB.

- **Exact-parity kernels** (`combine_overlaps`, `combine_overlaps_sleep`):
  the reference's sequential pairwise algorithms
  (``/root/reference/mhealth_feature_generation/data_cleaning.py:16-85``
  and ``:88-203``) are order-dependent on >2-row overlap chains, so exact
  parity needs the same sequential semantics. Implemented from scratch as
  numpy passes inside ``applyInPandas`` — Arrow-batched per
  ``(user_id[, type])`` group, distributed across entities; the sequential
  part is O(rows-per-entity), never O(dataset).

Quirks preserved deliberately (tested, not "fixed"):
  * overlap flags are computed ONCE from the original sorted neighbors;
    merges never re-evaluate overlap against the new, wider span.
  * a row fully contained in its predecessor is value-voided first, and
    any later pair touching a voided value is skipped, not merged.
  * ``combineOverlapsSleep`` keep-last branch is unreachable for clean
    inputs (prev-stage NaN routes to the split branch) — kept anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

ASLEEP_FOR_SPLIT = [
    "Asleep",
    "AsleepUnspecified",
    "AwakeUnspecified",
    "CategoryValueUnknown",
    "AsleepCore",
    "AsleepDeep",
    "AsleepREM",
]


# ---------------------------------------------------------------------------
# idiomatic scale path
# ---------------------------------------------------------------------------

def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    start_col: str = "local_start",
    end_col: str | None = "local_end",
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    running max end-time of all previous rows exceeds ``gap_minutes``.

    session_id = cumulative sum of break flags over (entity, start) order —
    one window pass, no Python. Reuses the engine's (entity, ts) layout.
    """
    end = end_col or start_col
    w = Window.partitionBy(entity_col).orderBy(start_col, end)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    gap_s = (
        F.unix_micros(F.col(start_col).cast("timestamp"))
        - F.unix_micros(prev_max_end.cast("timestamp"))
    ) / 6e7
    is_break = F.when(
        prev_max_end.isNull() | (gap_s > gap_minutes), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def merge_intervals(
    df: DataFrame,
    entity_col: str = "user_id",
    start_col: str = "local_start",
    end_col: str = "local_end",
    agg_exprs: list | None = None,
) -> DataFrame:
    """Union of overlapping/touching intervals per entity (island merge).

    Running-max island detection: rows whose start exceeds the max end of
    all previous rows open a new island; islands collapse via groupBy.
    This is the scale-correct counterpart of the reference's sequential
    overlap loop — O(n log n), native, shuffle-free after layout.
    """
    ids = sessionize(
        df, entity_col, start_col, end_col, gap_minutes=0.0, session_col="_island"
    )
    aggs = [
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
    ] + (agg_exprs or [])
    return ids.groupBy(entity_col, "_island").agg(*aggs).drop("_island")


# ---------------------------------------------------------------------------
# exact-parity kernels
# ---------------------------------------------------------------------------

def _dedup_sorted(pdf: pd.DataFrame, value_col: str) -> pd.DataFrame:
    """Reference pre-pass: drop duplicate (start,user,end,value,type) rows
    keep=last, then sort by local_start (data_cleaning.py:30-43)."""
    out = pdf.drop_duplicates(
        subset=["local_start", "user_id", "local_end", value_col, "type"],
        keep="last",
        # default (quicksort) kind, NOT stable: the reference sorts with
        # pandas defaults, and tie order changes merge outcomes
    ).sort_values(by="local_start")
    return out.reset_index(drop=True)


def _combine_overlaps_pdf(pdf: pd.DataFrame, value_col: str) -> pd.DataFrame:
    """Sequential duration-weighted overlap merge, reference semantics."""
    a = _dedup_sorted(pdf, value_col)
    n = len(a)
    if n == 0:
        a["duration"] = pd.Series(dtype="float64")
        return a
    start = a["local_start"].to_numpy(copy=True)
    end = a["local_end"].to_numpy(copy=True)
    val = a[value_col].astype("float64").to_numpy(copy=True)
    dur = (end - start) / np.timedelta64(60, "s")

    # overlap flags from ORIGINAL neighbors, fixed before any merge
    overlap = np.zeros(n, dtype=bool)
    if n > 1:
        overlap[1:] = (start[1:] < end[:-1]) & (end[1:] > start[:-1])
    contained = overlap.copy()
    if n > 1:
        contained[1:] &= end[1:] < end[:-1]
    val[contained] = np.nan

    for i in np.flatnonzero(overlap):
        if np.isnan(val[i]) or np.isnan(val[i - 1]):
            continue  # voided partner → skip, reference:62-63
        s = min(start[i - 1], start[i])
        e = max(end[i - 1], end[i])
        total_min = (e - s) / np.timedelta64(60, "s")
        val[i] = total_min * (val[i - 1] + val[i]) / (dur[i - 1] + dur[i])
        start[i], end[i], dur[i] = s, e, total_min
        val[i - 1] = np.nan  # predecessor merged away

    a["local_start"] = start
    a["local_end"] = end
    a[value_col] = val
    a["duration"] = dur
    return a[~np.isnan(val)]


def _combine_overlaps_sleep_pdf(pdf: pd.DataFrame, value_col: str) -> pd.DataFrame:
    """Stage-aware sequential overlap resolution, reference semantics
    (data_cleaning.py:88-203): same stage → extend start & drop prev;
    different stage, both-asleep or both-awake → extend end & drop prev;
    asleep vs awake → truncate prev end to current start."""
    a = _dedup_sorted(pdf, value_col)
    n = len(a)
    if n == 0:
        return a
    start = a["local_start"].to_numpy(copy=True)
    end = a["local_end"].to_numpy(copy=True)
    stage = a[value_col].to_numpy(copy=True)
    alive = np.ones(n, dtype=bool)

    overlap = np.zeros(n, dtype=bool)
    if n > 1:
        overlap[1:] = (start[1:] < end[:-1]) & (end[1:] > start[:-1])
    prev_stage = np.roll(stage, 1)
    same = np.zeros(n, dtype=bool)
    if n > 1:
        # pandas NaN == x is False, NaN != x is True → NaN prev routes to split
        same[1:] = pd.Series(stage[1:]).eq(pd.Series(prev_stage[1:])).to_numpy()
    combine_idx = np.flatnonzero(overlap & same)
    split_idx = np.flatnonzero(overlap & ~same)

    for i in combine_idx:
        if not alive[i - 1]:
            continue
        start[i] = min(start[i - 1], start[i])
        alive[i - 1] = False

    asleep_set = set(ASLEEP_FOR_SPLIT)
    for i in split_idx:
        if not alive[i - 1] or not alive[i]:
            continue
        a_prev = stage[i - 1] in asleep_set
        a_cur = stage[i] in asleep_set
        if a_prev == a_cur:  # both asleep or both awake → merge, keep last
            end[i] = max(end[i - 1], end[i])
            alive[i - 1] = False
        else:  # split: truncate previous at current start
            end[i - 1] = start[i]

    # keep-last residual branch (unreachable for clean inputs) — fidelity
    residual = np.flatnonzero(overlap & ~same & np.zeros(n, dtype=bool))
    for i in residual:  # pragma: no cover
        if alive[i - 1] and stage[i - 1] != "InBed":
            alive[i - 1] = False

    a["local_start"] = start
    a["local_end"] = end
    return a[alive]


def _kernel_schema(df: DataFrame, add_duration: bool) -> T.StructType:
    fields = list(df.schema.fields)
    if add_duration:
        fields = fields + [T.StructField("duration", T.DoubleType(), True)]
    return T.StructType(fields)


def combine_overlaps(
    df: DataFrame,
    value_col: str = "value_num",
    group_cols: tuple[str, ...] = ("user_id", "type"),
) -> DataFrame:
    """I1: duration-weighted merge of overlapping activity intervals.

    Exact-parity Arrow kernel per (entity, type) group; adds ``duration``
    (minutes). Distributed across groups — the sequential pass is bounded
    by one entity's rows (thousands), never the dataset.
    """
    out_schema = _kernel_schema(df, add_duration=True)
    cols = df.columns

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        res = _combine_overlaps_pdf(pdf, value_col)
        return res[cols + ["duration"]]

    return df.groupBy(*group_cols).applyInPandas(kernel, out_schema)


def combine_overlaps_sleep(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """I2: stage-aware overlap resolution for sleep intervals (exact
    parity with the reference's sequential algorithm)."""
    out_schema = _kernel_schema(df, add_duration=False)
    cols = df.columns

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        res = _combine_overlaps_sleep_pdf(pdf, value_col)
        return res[cols]

    return df.groupBy(*group_cols).applyInPandas(kernel, out_schema)
