"""Structured Streaming equivalents of the engine's batch operators.

The reference is batch-only (SURVEY §2.15) — these are the engine
additions for incremental pipelines, sharing semantics with the batch
ops so a backfill (batch) and the live stream produce the same features:

- ``stream_tumbling_stats`` — R1/R4 tumbling windows with a watermark as
  the late-data bound (the streaming face of the leakage guard: events
  later than the watermark never mutate an emitted window).
- ``stream_sessionize``    — I-family gap sessions via ``session_window``.
- ``stream_asof_enrich``   — stream-static as-of enrichment (each stream
  row joined to the latest static dimension row at-or-before its ts is
  approximated by broadcast equi-join on the entity + filter; exact
  as-of needs the static side snapshotted per microbatch).

All are plain DataFrame transformations: apply them to
``spark.readStream`` inputs and any sink/trigger combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_tumbling_stats(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling per-entity window aggregates with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(entity_col, F.window(ts_col, window).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.avg(value_col).alias("mean_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(
            entity_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "mean_v",
            "min_v",
            "max_v",
        )
    )


def stream_sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` (the streaming twin of
    intervals.sessionize — same gap semantics, incremental state)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(entity_col, F.session_window(ts_col, gap).alias("s"))
        .agg(F.count("*").alias("n_events"), F.sum(value_col).alias("sum_v"))
        .select(
            entity_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_v",
        )
    )


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """Streaming exact dedup (the incremental face of
    dedup.exact_dedup_groups): fingerprint each document and keep ONE
    row per fingerprint (within a microbatch the survivor is
    partition-order dependent, not necessarily the earliest arrival —
    dropDuplicatesWithinWatermark semantics), state bounded by the
    watermark
    (``dropDuplicatesWithinWatermark``) — at 100 TB/day the alternative,
    unbounded dedup state, is not operable. Duplicates farther apart than
    the watermark re-emit by design; the batch operator is the exact
    backstop over the full corpus."""
    from mhealth_spark.pipelines.text import words_col

    with_fp = docs.withColumn(
        fingerprint_col, F.md5(F.concat_ws(" ", words_col(text_col)))
    )
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )


def stream_asof_enrich(
    stream: DataFrame,
    static_dim: DataFrame,
    entity_col: str = "user_id",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment: broadcast the (small) dimension and
    attach its columns per entity. The static side is re-read every
    microbatch, so slowly-changing dimensions stay fresh."""
    cols = value_cols or [c for c in static_dim.columns if c != entity_col]
    dim = static_dim.select(entity_col, *cols)
    return stream.join(F.broadcast(dim), entity_col, "left")
