"""input_hint invariants: the tokens table is deterministic and the engine
passes token arrays through BYTE-IDENTICAL on non-aggregated rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from mhealth_spark.source import layout_events
from mhealth_spark.synth import synth_tokens


def test_synth_tokens_deterministic(spark):
    a = synth_tokens(spark, 200, seed=42).toPandas().sort_values("doc_id")
    b = synth_tokens(spark, 200, seed=42).toPandas().sort_values("doc_id")
    assert (a.doc_id.values == b.doc_id.values).all()
    for x, y in zip(a.tokens, b.tokens):
        assert list(x) == list(y)
    assert (a.n_tok == a.tokens.map(len)).all()


def test_tokens_passthrough_equality(spark):
    """Run the tokens table through the engine's physical layout +
    a filter/enrich pipeline; token arrays must be untouched."""
    df = synth_tokens(spark, 500, seed=7)
    out = (
        layout_events(df, entity_col="source", ts_col="ts")
        .filter(F.col("n_tok") >= 16)
        .withColumn("tok_sum", F.aggregate("tokens", F.lit(0), lambda acc, x: acc + x))
    )
    joined = (
        df.alias("a")
        .join(out.alias("b"), "doc_id")
        .select(
            F.col("a.tokens").alias("t0"),
            F.col("b.tokens").alias("t1"),
        )
        .withColumn("eq", F.col("t0") == F.col("t1"))
    )
    n_total = df.count()
    n_eq = joined.filter("eq").count()
    assert joined.count() == n_total  # filter keeps all (n_tok >= 16 by synth)
    assert n_eq == n_total


def test_skew_distribution(spark):
    """synth tokens deliberately produce a heavy entity for skew tests."""
    counts = (
        synth_tokens(spark, 2000, seed=42)
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    assert counts.idxmax() == "web"
    assert counts.max() > 0.4 * counts.sum()


def test_feature_vectors_consistent_with_row_features(spark):
    """The narrow tier and the payload-join path must agree feature-for-
    feature: row_features = feature_vectors ⋈ payload, nothing more."""
    import pandas as pd

    from mhealth_spark.tokens_engine import feature_vectors, row_features

    tk = synth_tokens(spark, 600, seed=13)
    fv = feature_vectors(tk).toPandas().set_index("doc_id").sort_index()
    rf = (
        row_features(tk)
        .drop("tokens")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(fv.columns) == set(rf.columns)
    for c in fv.columns:
        pd.testing.assert_series_equal(fv[c], rf[c], check_names=False)
