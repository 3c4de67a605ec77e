"""Streaming ops: batch/stream agreement via file source + availableNow
trigger + memory sink."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mhealth_spark.streaming import stream_sessionize, stream_tumbling_stats


def _write_events(spark, path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in ["a", "b"]:
        for i in range(50):
            rows.append(
                dict(
                    user_id=u,
                    ts=base + dt.timedelta(minutes=7 * i + (5 if u == "b" else 0)),
                    value=float(i),
                )
            )
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _run_stream(spark, path, transform, name):
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "append" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_stream_tumbling_matches_batch(spark, tmp_path):
    path = str(tmp_path / "ev")
    batch_df = _write_events(spark, path)
    got = _run_stream(
        spark, path, lambda s: stream_tumbling_stats(s, window="1 hour"), "t_tumble"
    ).sort_values(["user_id", "window_start"]).reset_index(drop=True)
    exp = (
        batch_df.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.avg("value").alias("mean_v"))
        .select("user_id", F.col("w.start").alias("window_start"), "n", "mean_v")
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_stream_sessionize(spark, tmp_path):
    path = str(tmp_path / "ev2")
    _write_events(spark, path)
    got = _run_stream(
        spark, path, lambda s: stream_sessionize(s, gap="30 minutes"), "t_sess"
    )
    # 7-minute cadence with 30-minute gap → one session per user
    assert len(got) == 2
    assert (got["n_events"] == 50).all()


def test_stream_exact_dedup_first_arrival(spark, tmp_path):
    """stream_exact_dedup: one row per fingerprint within the watermark,
    agreeing with the batch dedup's group structure."""
    from mhealth_spark.streaming import stream_exact_dedup

    base = dt.datetime(2024, 1, 1)
    rows = []
    texts = ["the quick brown fox", "lorem ipsum dolor", "the quick  brown fox"]
    # texts[0] and texts[2] normalize to the same fingerprint (whitespace)
    for i, t in enumerate(texts * 4):
        rows.append(dict(doc_id=f"d{i}", ts=base + dt.timedelta(minutes=i), text=t))
    path = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(path)

    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_exact_dedup(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_dedup").toPandas()
    # 12 rows, 2 distinct fingerprints -> exactly 2 survivors, one per
    # group (within a single microbatch the survivor is partition-order
    # dependent, NOT necessarily the earliest ts — Spark semantics)
    assert len(got) == 2
    assert len(set(got["fp"])) == 2
    dup_group = {f"d{i}" for i, t in enumerate(texts * 4) if "quick" in t}
    other_group = {f"d{i}" for i, t in enumerate(texts * 4) if "quick" not in t}
    ids = set(got["doc_id"])
    assert len(ids & dup_group) == 1 and len(ids & other_group) == 1


def test_stream_rolling_features_matches_batch_across_microbatches(spark, tmp_path):
    """stream_rolling_features (applyInPandasWithState): two microbatches
    (maxFilesPerTrigger=1, files split on ts) must agree with the batch
    feature_vectors on every shared column — i.e. the carried state (last
    K counts + last ts) exactly reconstructs the batch rolling frame."""
    from mhealth_spark.streaming import stream_rolling_features
    from mhealth_spark.tokens_engine import feature_vectors

    base = dt.datetime(2024, 1, 1)
    rows = []
    for w in ["w1", "w2", "w3"]:
        for i in range(40):
            rows.append(
                dict(
                    doc_id=f"{w}-d{i:03d}",
                    writer_id=w,
                    ts=base + dt.timedelta(minutes=13 * i + (3 if w == "w2" else 0)),
                    n_tok=(i * 7) % 29 + 1,
                )
            )
    pdf = pd.DataFrame(rows)
    cut = base + dt.timedelta(minutes=13 * 20)
    path = tmp_path / "tk_stream"
    path.mkdir()
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).withColumn("n_tok", F.col("n_tok").cast("int"))
    early = sdf.where(F.col("ts") < F.lit(cut))
    late = sdf.where(F.col("ts") >= F.lit(cut))
    early.coalesce(1).write.parquet(str(path / "b0"))
    import time as _t
    _t.sleep(1.1)  # file-source ordering is by modification time
    late.coalesce(1).write.parquet(str(path / "b1"))

    schema = sdf.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path / "*"))
    )
    out = stream_rolling_features(stream, lookback_rows=5)
    q = (
        out.writeStream.format("memory")
        .queryName("t_roll")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("SELECT * FROM t_roll")
        .toPandas()
        .sort_values(["writer_id", "ts", "doc_id"])
        .reset_index(drop=True)
    )
    exp = (
        feature_vectors(sdf, lookback_rows=5)
        .drop("next_n_tok")
        .toPandas()
        .sort_values(["writer_id", "ts", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == 120
    for col in [
        "doc_id", "writer_id", "ts", "n_tok", "prev_n_tok", "delta_n_tok",
        "roll_sum_n_tok", "roll_count", "gap_us",
    ]:
        ge, ee = got[col].to_numpy(), exp[col].to_numpy()
        assert (pd.isna(ge) == pd.isna(ee)).all(), col
        mask = ~pd.isna(ge)
        assert (ge[mask] == ee[mask]).all(), col
    import numpy as np
    g, e = got["roll_mean_n_tok"].to_numpy(float), exp["roll_mean_n_tok"].to_numpy(float)
    assert np.allclose(g, e, equal_nan=True)


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """stream_decontaminate (broadcast shingle probe) keeps exactly the
    docs the batch decontaminate keeps."""
    from mhealth_spark.pipelines.corpus import decontaminate
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_decontaminate

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    corpus_side = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)

    path = str(tmp_path / "docs_stream")
    corpus_side.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_decontaminate(stream, bench)
    q = (
        out.writeStream.format("memory")
        .queryName("t_decon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(
        spark.sql("SELECT doc_id FROM t_decon").toPandas()["doc_id"]
    )
    exp = {r.doc_id for r in decontaminate(corpus_side, bench).select("doc_id").collect()}
    assert got == exp
    assert len(got) < corpus_side.count()  # something was actually dropped


def test_stream_stateless_corpus_ops_match_batch(spark, tmp_path):
    """split_corpus / quality_filter / redact_pii are stateless maps, so
    they run unchanged on a streaming DataFrame and must agree row-for-row
    with the batch result — the property that lets one filtering codebase
    serve both the bulk corpus build and the live ingestion path."""
    from mhealth_spark.pipelines.corpus import chunk_windows, split_corpus
    from mhealth_spark.pipelines.text import (
        pretokenize,
        quality_filter,
        redact_pii,
    )
    from mhealth_spark.source import read_table

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema

    cases = {
        "s_split": lambda d: split_corpus(d, {"train": 0.9, "test": 0.1})
        .select("doc_id", "split"),
        "s_qf": lambda d: quality_filter(d),
        "s_pii": lambda d: redact_pii(d).select("doc_id", "n_pii_redacted"),
        "s_chunk": lambda d: chunk_windows(d).select(
            "doc_id", "chunk_id", "start_word", "n_words"
        ),
        "s_pretok": lambda d: pretokenize(d).select("doc_id", "n_pretokens"),
    }
    for name, fn in cases.items():
        batch = fn(spark.read.parquet(path)).toPandas()
        stream = spark.readStream.schema(schema).parquet(path)
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        cols = sorted(batch.columns)
        b = batch[cols].sort_values(cols).reset_index(drop=True)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(b, g)


def test_stream_neardup_candidates_matches_batch(spark, tmp_path):
    """stream_neardup_candidates across two microbatches: the distinct
    unordered candidate-pair set must equal the batch
    minhash_lsh_candidates (xxh tier) on the same docs — the carried
    per-bucket id state exactly reconstructs the batch bucket grouping."""
    from mhealth_spark.pipelines.dedup import minhash_lsh_candidates
    from mhealth_spark.streaming import stream_neardup_candidates

    base = dt.datetime(2024, 1, 1)
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine eleven",
        "totally different words in this particular document here now yes",
    ]
    rows = []
    for i in range(20):
        rows.append(
            dict(
                doc_id=f"d{i:02d}",
                ts=base + dt.timedelta(minutes=i),
                text=texts[i % len(texts)],
            )
        )
    pdf = pd.DataFrame(rows)
    path = tmp_path / "nd_stream"
    path.mkdir()
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    cut = base + dt.timedelta(minutes=10)
    sdf.where(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(
        str(path / "b0")
    )
    import time as _t

    _t.sleep(1.1)
    sdf.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(
        str(path / "b1")
    )

    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path / "*"))
    )
    out = stream_neardup_candidates(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_nd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_nd").toPandas()
    assert not got.truncated.any()
    stream_pairs = {
        tuple(sorted(p)) for p in zip(got.matched_id, got.doc_id)
    }

    batch = minhash_lsh_candidates(sdf, hash_fn="xxh").toPandas()
    batch_pairs = {tuple(sorted(p)) for p in zip(batch.id_a, batch.id_b)}
    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0


def test_stream_anomaly_matches_batch(spark, tmp_path):
    """stream_anomaly across two microbatches equals the batch
    anomaly_scores on in-order input — the carried K-count tail exactly
    reconstructs the batch trailing frame (incl. mean/std/z/flag)."""
    from mhealth_spark.streaming import stream_anomaly
    from mhealth_spark.tokens_engine import anomaly_scores

    base = dt.datetime(2024, 1, 1)
    rows = []
    for w in ["w1", "w2"]:
        for i in range(40):
            n = (i * 7) % 23 + 5
            if i == 30:
                n = 500  # injected anomaly
            rows.append(
                dict(
                    doc_id=f"{w}-d{i:03d}",
                    writer_id=w,
                    ts=base + dt.timedelta(minutes=11 * i),
                    n_tok=n,
                )
            )
    pdf = pd.DataFrame(rows)
    path = tmp_path / "anom_stream"
    path.mkdir()
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).withColumn("n_tok", F.col("n_tok").cast("int"))
    cut = base + dt.timedelta(minutes=11 * 20)
    sdf.where(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(str(path / "b0"))
    import time as _t

    _t.sleep(1.1)
    sdf.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(str(path / "b1"))

    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path / "*"))
    )
    q = (
        stream_anomaly(stream)
        .writeStream.format("memory")
        .queryName("t_anom")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_anom").toPandas()

    batch = anomaly_scores(sdf).toPandas()
    cols = ["doc_id", "writer_id", "n_tok", "roll_count", "is_anomaly"]
    g = got[cols + ["roll_mean", "roll_std", "z_score"]].sort_values(
        "doc_id").reset_index(drop=True)
    b = batch[cols + ["roll_mean", "roll_std", "z_score"]].sort_values(
        "doc_id").reset_index(drop=True)
    assert len(g) == len(b) == 80
    assert g.is_anomaly.sum() >= 2  # the injected spikes alarm
    pd.testing.assert_frame_equal(
        g.astype({"roll_count": "int64"}),
        b.astype({"roll_count": "int64"}),
        check_dtype=False,
        atol=1e-9,
    )


def test_stream_backfill_features_matches_batch(spark, tmp_path):
    """stream_backfill_features: streaming requests + static event table
    must equal the batch backfill twin on every (entity, req_ts) — same
    strict as-of guard, zero-event requests included."""
    from mhealth_spark.streaming import stream_backfill_features
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import backfill_features, hourly_requests

    events = spark.read.parquet(
        materialize_synth_tokens(spark, 600, seed=42)
    ).select("doc_id", "source", "ts", "n_tok")
    requests = hourly_requests(events)
    req_path = str(tmp_path / "reqs")
    requests.write.parquet(req_path)

    stream = spark.readStream.schema(
        spark.read.parquet(req_path).schema
    ).parquet(req_path)
    q = (
        stream_backfill_features(stream, events)
        .writeStream.format("memory")
        .queryName("t_backfill")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_backfill").toPandas()

    batch = backfill_features(events, requests).toPandas()
    key = ["source", "ts"]
    cols = key + ["docs_24h", "tokens_24h", "mean_len_24h", "max_len_24h"]
    g = got[cols].sort_values(key).reset_index(drop=True)
    b = batch[cols].sort_values(key).reset_index(drop=True)
    assert len(g) == len(b) > 0
    pd.testing.assert_frame_equal(g, b, check_dtype=False, atol=1e-9)


def test_stream_backfill_features_append_mode_watermark(spark, tmp_path):
    """Production face: append output with a watermark — emitted requests
    (those the final watermark passed) must match the batch twin exactly;
    nothing beyond the watermark is emitted wrong, only withheld."""
    from mhealth_spark.streaming import stream_backfill_features
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import backfill_features, hourly_requests

    events = spark.read.parquet(
        materialize_synth_tokens(spark, 400, seed=42)
    ).select("doc_id", "source", "ts", "n_tok")
    requests = hourly_requests(events)
    req_path = str(tmp_path / "reqs_a")
    requests.write.parquet(req_path)

    stream = spark.readStream.schema(
        spark.read.parquet(req_path).schema
    ).parquet(req_path)
    q = (
        stream_backfill_features(stream, events, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_backfill_app")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_backfill_app").toPandas()

    batch = backfill_features(events, requests).toPandas()
    key = ["source", "ts"]
    cols = key + ["docs_24h", "tokens_24h", "mean_len_24h", "max_len_24h"]
    b = batch[cols].set_index(key)
    g = got[cols].set_index(key)
    # append emits only watermark-finalized groups: subset, never wrong
    assert 0 < len(g) <= len(b)
    joined = g.join(b, how="left", rsuffix="_b")
    for c in ["docs_24h", "tokens_24h", "mean_len_24h", "max_len_24h"]:
        lhs, rhs = joined[c], joined[f"{c}_b"]
        assert ((lhs == rhs) | (lhs.isna() & rhs.isna())).all(), c


def test_stream_label_horizon_matches_batch(spark, tmp_path):
    """stream_label_horizon: streaming requests + static event table must
    equal the batch forward-label twin on every (entity, req_ts),
    empty-horizon requests included."""
    from mhealth_spark.streaming import stream_label_horizon
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import hourly_requests, label_horizon_features

    events = spark.read.parquet(
        materialize_synth_tokens(spark, 500, seed=42)
    ).select("doc_id", "source", "ts", "n_tok")
    requests = hourly_requests(events)
    req_path = str(tmp_path / "reqs_lh")
    requests.write.parquet(req_path)

    stream = spark.readStream.schema(
        spark.read.parquet(req_path).schema
    ).parquet(req_path)
    q = (
        stream_label_horizon(stream, events)
        .writeStream.format("memory")
        .queryName("t_label_horizon")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_label_horizon").toPandas()

    batch = label_horizon_features(events, requests).toPandas()
    key = ["source", "ts"]
    cols = key + ["docs_next", "tokens_next", "first_gap_s"]
    g = got[cols].sort_values(key).reset_index(drop=True)
    b = batch[cols].sort_values(key).reset_index(drop=True)
    assert len(g) == len(b) > 0
    pd.testing.assert_frame_equal(g, b, check_dtype=False, atol=1e-9)


def test_stream_dsir_score_matches_batch(spark, tmp_path):
    """stream_dsir_score with a frozen lambda table must reproduce the
    batch dsir_weights scores doc-for-doc (same buckets, same mean), and
    min_weight must gate the stream exactly like a batch filter."""
    from mhealth_spark.pipelines.corpus import dsir_lambda_table, dsir_weights
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_dsir_score

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    target = "source IN ('src0', 'src1')"
    lam = dsir_lambda_table(docs, target)

    batch = dsir_weights(docs, target, lam=lam).toPandas()
    exp = batch.set_index("doc_id")

    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_dsir_score(stream, lam)
    q = (
        out.writeStream.format("memory")
        .queryName("t_dsir")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT doc_id, n_feats, dsir_weight FROM t_dsir"
    ).toPandas().set_index("doc_id")
    assert set(got.index) == set(exp.index)
    g = got.loc[exp.index]
    assert (g.n_feats == exp.n_feats).all()
    np.testing.assert_allclose(
        g.dsir_weight.values, exp.dsir_weight.values, atol=1e-9
    )

    thr = float(batch.dsir_weight.median())
    stream2 = spark.readStream.schema(schema).parquet(path)
    q2 = (
        stream_dsir_score(stream2, lam, min_weight=thr)
        .writeStream.format("memory")
        .queryName("t_dsir_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    kept = set(spark.sql("SELECT doc_id FROM t_dsir_gate").toPandas()["doc_id"])
    assert kept == set(batch[batch.dsir_weight >= thr].doc_id)


def test_stream_ann_serve_matches_batch(spark, tmp_path):
    """stream_ann_serve (in-memory PQ index, per-query numpy ADC inside
    a pandas UDF) must reproduce batch ann_ivfpq_adc rank-for-rank on a
    streamed query set."""
    from mhealth_spark.pipelines.similarity import (
        ann_ivfpq_adc,
        ivfpq_encode,
        ivfpq_residuals,
        pick_centroids,
        pick_pq_codebooks,
    )
    from mhealth_spark.streaming import stream_ann_serve

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = pick_centroids(emb, 8)
    res = ivfpq_residuals(emb, cents)
    cb = pick_pq_codebooks(res, n_subspaces=8, n_codes=8, vec_col="r", salt="pqr0")
    enc = ivfpq_encode(res, cb)
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exp = (
        ann_ivfpq_adc(enc, cents, cb, queries, k=5, n_probe=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    rows = [(int(r["vec_id"]), int(r["cid"]), list(r["codes"]))
            for r in enc.collect()]
    qpath = str(tmp_path / "queries")
    queries.write.parquet(qpath)
    schema = spark.read.parquet(qpath).schema
    stream = spark.readStream.schema(schema).parquet(qpath)
    out = stream_ann_serve(stream, rows, cents, cb, k=5, n_probe=3)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ann_serve")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM t_ann_serve")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    key = ["query_id", "neighbor_id", "rank"]
    pd.testing.assert_frame_equal(got[key], exp[key])
    np.testing.assert_allclose(
        got.adc_dist.values, exp.adc_dist.values, atol=1e-9
    )


def test_stream_line_dedup_matches_batch(spark, tmp_path):
    """stream_line_dedup with a frozen duplicated-line set built from
    the same corpus must equal batch line_dedup (drop-all) doc-for-doc:
    same kept counts, same reconstructed text."""
    from mhealth_spark.pipelines.text import line_dedup, line_duplicate_hashes
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_line_dedup

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    # wrap into deterministic 10-word lines so lines actually duplicate
    w = F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    wrapped = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.ceil(F.size(w) / 10.0).cast("int"), F.lit(1)),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(w, (i - F.lit(1)) * 10 + F.lit(1), F.lit(10))
                ),
            ),
        ).alias("text"),
    )
    exp = (
        line_dedup(wrapped)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    dset = {r.h for r in line_duplicate_hashes(wrapped).collect()}
    assert dset, "expected some duplicated lines in the fixture"

    path = str(tmp_path / "wrapped")
    wrapped.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        stream_line_dedup(stream, dset)
        .select("doc_id", "n_lines", "n_kept", "text_clean")
        .writeStream.format("memory")
        .queryName("t_linededup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM t_linededup")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (got.n_lines == exp.n_lines).all()
    assert (got.n_kept == exp.n_kept).all()
    assert (got.text_clean == exp.text_clean).all()


def test_stream_winnow_match_parity_and_flags(spark, tmp_path):
    """Streaming MOSS matching: the python-side sketch must equal the
    batch winnow_fingerprints sketch per doc — streaming a corpus
    against its OWN batch-built index matches every fingerprint, with
    per-doc counts equal to the batch distinct-hash counts; unrelated
    text flags zero."""
    from mhealth_spark.pipelines.text import winnow_fingerprints
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_winnow_match

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    fp = winnow_fingerprints(docs, k=5, w=4).toPandas()
    index = set(fp.h)
    exp_counts = fp.groupby("doc_id").h.nunique()

    path = str(tmp_path / "docs_wm")
    docs.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        stream_winnow_match(stream, index, k=5, w=4)
        .select("doc_id", "n_fingerprints", "n_matched", "winnow_flagged")
        .writeStream.format("memory")
        .queryName("t_winnow_match")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM t_winnow_match").toPandas().set_index("doc_id")
    )
    assert (got.n_matched == got.n_fingerprints).all()
    g = got.n_fingerprints.loc[exp_counts.index]
    assert (g == exp_counts).all()
    # docs with a single-fingerprint sketch can't reach min_matches=2
    assert got[got.n_fingerprints >= 2].winnow_flagged.all()

    # unrelated vocabulary: zero matches, not flagged
    alien = spark.createDataFrame(
        [(999, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm")],
        "doc_id long, text string",
    )
    apath = str(tmp_path / "alien")
    alien.write.parquet(apath)
    s2 = spark.readStream.schema(spark.read.parquet(apath).schema).parquet(apath)
    q2 = (
        stream_winnow_match(s2, index, k=5, w=4)
        .select("doc_id", "n_matched", "winnow_flagged")
        .writeStream.format("memory")
        .queryName("t_winnow_alien")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    a = spark.sql("SELECT * FROM t_winnow_alien").toPandas()
    assert (a.n_matched == 0).all() and not a.winnow_flagged.any()


def test_stream_bm25_score_matches_batch(spark, tmp_path):
    """stream_bm25_score with frozen (idf, avgdl) must score arriving
    docs BIT-IDENTICALLY to the batch fold: per-doc raw scores equal a
    Python float reference that replays bm25_score_expr's exact
    operation order, matched docs agree with bm25_scores after
    identical Spark-side rounding, and min_score gates the stream
    exactly like a batch filter."""
    from mhealth_spark.pipelines.text import bm25_scores, bm25_stats
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_bm25_score

    docs = read_table(spark, "documents", "/root/testdata/sf0.001")
    terms = ["hash", "join", "vector"]
    idf, avgdl = bm25_stats(docs, terms)
    assert set(idf) <= set(terms) and avgdl > 0

    k1, b = 1.2, 0.75

    def py_score(text):
        w = [x for x in text.split() if x]
        norm = k1 * (1.0 - b + b * float(len(w)) / avgdl)
        s = 0.0
        for t in sorted(idf):
            tf = float(w.count(t))
            s += idf[t] * (tf * (k1 + 1.0)) / (tf + norm)
        return s

    exp = {
        r["doc_id"]: py_score(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }

    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        stream_bm25_score(stream, idf, avgdl)
        .select("doc_id", "bm25", F.round("bm25", 6).alias("bm25_r"))
        .writeStream.format("memory")
        .queryName("t_bm25")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_bm25").toPandas().set_index("doc_id")
    assert set(got.index) == set(exp)
    for d, s in exp.items():
        assert got.bm25.loc[d] == s, d  # bit-exact, no tolerance

    # top_k sized to the corpus: TakeOrderedAndProject allocates O(k),
    # so "no limit" must be expressed as n_docs, not a huge sentinel
    batch = bm25_scores(docs, terms, top_k=int(docs.count())).toPandas()
    assert len(batch) > 0
    m = got.bm25_r.loc[batch.doc_id.values].values
    assert (m == batch.bm25.values).all()
    # non-matched docs score exactly 0.0 (batch emits no row for them)
    zero = got.drop(index=batch.doc_id)
    assert (zero.bm25 == 0.0).all()

    thr = float(batch.bm25.median())
    stream2 = spark.readStream.schema(schema).parquet(path)
    q2 = (
        stream_bm25_score(stream2, idf, avgdl, min_score=thr)
        .writeStream.format("memory")
        .queryName("t_bm25_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    kept = set(spark.sql("SELECT doc_id FROM t_bm25_gate").toPandas()["doc_id"])
    assert kept == {d for d, s in exp.items() if s >= thr}


def test_stream_stream_backfill_matches_batch(spark, tmp_path):
    """stream_stream_backfill (requests AND events both streaming,
    chained stateful join+agg) must agree EXACTLY with the batch as-of
    twin on every emitted request, emit no spurious requests, and emit
    the overwhelming majority (only the watermark-withheld tail may be
    missing)."""
    from mhealth_spark.streaming import stream_stream_backfill
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import backfill_features, hourly_requests

    events = spark.read.parquet(materialize_synth_tokens(spark, 400, seed=13))
    requests = hourly_requests(events)
    ep, rp = str(tmp_path / "ev"), str(tmp_path / "rq")
    events.write.parquet(ep)
    requests.write.parquet(rp)

    ev = spark.readStream.schema(spark.read.parquet(ep).schema).parquet(ep)
    rq = spark.readStream.schema(spark.read.parquet(rp).schema).parquet(rp)
    q = (
        stream_stream_backfill(rq, ev)
        .writeStream.format("memory")
        .queryName("t_ssbf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM t_ssbf").toPandas()
    batch = backfill_features(events, requests).toPandas()
    # pandas NTZ vs TZ: compare on formatted keys
    got["k"] = got.source + "|" + got.ts.dt.strftime("%Y-%m-%d %H:%M:%S")
    batch["k"] = batch.source + "|" + batch.ts.dt.strftime("%Y-%m-%d %H:%M:%S")
    b = batch.set_index("k")
    assert set(got.k) <= set(b.index)  # nothing spurious
    assert len(got) >= 0.9 * len(batch)  # only the watermark tail withheld
    g = got.set_index("k")
    ref = b.loc[g.index]
    assert (g.docs_24h == ref.docs_24h).all()
    for col in ("tokens_24h", "max_len_24h"):
        both_null = g[col].isna() & ref[col].isna()
        assert (both_null | (g[col] == ref[col])).all(), col
    both_null = g.mean_len_24h.isna() & ref.mean_len_24h.isna()
    assert (
        both_null
        | ((g.mean_len_24h - ref.mean_len_24h).abs() < 1e-9)
    ).all()
    # the withheld tail is exactly the LATEST requests, never interior
    missing = batch[~batch.k.isin(got.k)]
    if len(missing):
        assert missing.ts.min() > got.ts.max() - pd.Timedelta(hours=26)


def test_stream_stream_labels_matches_batch(spark, tmp_path):
    """stream_stream_labels (both sides streaming, strict-future horizon
    window) must agree EXACTLY with batch label_horizon_features on
    every emitted request — online label materialization pays the
    horizon in emission latency (the withheld tail), never in wrong
    values."""
    from mhealth_spark.streaming import stream_stream_labels
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import (
        hourly_requests,
        label_horizon_features,
    )

    events = spark.read.parquet(materialize_synth_tokens(spark, 400, seed=13))
    requests = hourly_requests(events)
    ep, rp = str(tmp_path / "ev_l"), str(tmp_path / "rq_l")
    events.write.parquet(ep)
    requests.write.parquet(rp)

    ev = spark.readStream.schema(spark.read.parquet(ep).schema).parquet(ep)
    rq = spark.readStream.schema(spark.read.parquet(rp).schema).parquet(rp)
    q = (
        stream_stream_labels(rq, ev)
        .writeStream.format("memory")
        .queryName("t_sslab")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM t_sslab").toPandas()
    batch = label_horizon_features(events, requests).toPandas()
    got["k"] = got.source + "|" + got.ts.dt.strftime("%Y-%m-%d %H:%M:%S")
    batch["k"] = batch.source + "|" + batch.ts.dt.strftime("%Y-%m-%d %H:%M:%S")
    b = batch.set_index("k")
    assert set(got.k) <= set(b.index)
    assert len(got) >= 0.5 * len(batch)
    g = got.set_index("k")
    ref = b.loc[g.index]
    assert (g.docs_next == ref.docs_next).all()
    for col in ("tokens_next", "first_gap_s"):
        both_null = g[col].isna() & ref[col].isna()
        assert (both_null | (g[col] == ref[col])).all(), col


def test_stream_drift_psi_matches_python(spark, tmp_path):
    """stream_drift_psi: windowed conditional-count histogram + frozen
    baseline must reproduce the exact PSI a Python replay computes per
    closed (source, day) window (1e-12 rel for Java-vs-libm ln), and a
    planted shifted day must alarm."""
    import datetime as ddt
    import math

    import numpy as np

    rows = []
    base = ddt.datetime(2024, 1, 1)
    k = 0
    for d in range(6):
        lens = [17, 23, 33, 47, 60] if d < 5 else [600, 900, 1500, 2000]
        for i, L in enumerate(lens):
            rows.append((f"d{k}", "s0", base + ddt.timedelta(days=d, minutes=i), L))
            k += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "ts", "n_tok"])
    path = str(tmp_path / "docs_psi")
    spark.createDataFrame(pdf).withColumn(
        "n_tok", F.col("n_tok").cast("int")
    ).write.parquet(path)

    def b_of(n):
        return min(int(math.floor(math.log2(max(n, 1)))), 13)

    # frozen baseline = day 0's histogram
    baseline = [0] * 14
    for _, _, ts, L in rows:
        if ts.date() == ddt.date(2024, 1, 1):
            baseline[b_of(L)] += 1
    from mhealth_spark.streaming import stream_drift_psi

    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    q = (
        stream_drift_psi(stream, {"s0": baseline})
        .writeStream.format("memory")
        .queryName("t_psi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_psi").toPandas()
    # append mode withholds windows the watermark hasn't closed
    assert len(got) >= 4

    nb = sum(baseline)
    for _, r in got.iterrows():
        d = r.day.date()
        ct = [0] * 14
        for _, _, ts, L in rows:
            if ts.date() == d:
                ct[b_of(L)] += 1
        nt = sum(ct)
        psi = 0.0
        for b in range(14):
            p = (ct[b] + 0.5) / (nt + 7.0)
            qq = (baseline[b] + 0.5) / (nb + 7.0)
            psi += (p - qq) * math.log(p / qq)
        assert (r.n_today, r.n_base) == (nt, nb), d
        assert np.isclose(r.psi, psi, rtol=1e-12, atol=0.0), d

    shifted = got[got.day.dt.date == ddt.date(2024, 1, 6)]
    stable = got[got.day.dt.date < ddt.date(2024, 1, 6)]
    if len(shifted):
        assert shifted.psi.min() > 3 * stable.psi.max()


def test_stream_hour_partials_online_ingest_loop(spark, tmp_path):
    """The full online ingest loop: stream_hour_partials over a live
    batch must equal batch hour_partials field-for-field on every
    emitted (closed) hour — including events exactly on the hour
    boundary — and merging the streamed partials into a persisted
    partial table then assembling training_set_grid must equal the
    one-shot batch build on the covered grid."""
    import datetime as ddt

    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import (
        hour_partials,
        merge_hour_partials,
        training_set_grid,
    )
    from mhealth_spark.streaming import stream_hour_partials

    events = spark.read.parquet(materialize_synth_tokens(spark, 500, seed=19))
    # plant an exactly-on-the-hour event (the ceiling-boundary case)
    extra = spark.createDataFrame(
        [("boundary-doc", [1, 2, 3], 3, "src0", "w0",
          ddt.datetime(2024, 1, 2, 5, 0, 0))],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "writer_id string, ts timestamp_ntz",
    )
    events = events.unionByName(extra)

    cut = ddt.datetime(2024, 1, 4)
    old = events.filter(F.col("ts") < F.lit(cut))
    new = events.filter(F.col("ts") >= F.lit(cut))
    assert old.count() > 0 and new.count() > 0

    path = str(tmp_path / "new_events")
    new.write.parquet(path)
    stream = spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
    q = (
        stream_hour_partials(stream)
        .writeStream.format("memory")
        .queryName("t_hp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_hp").toPandas()
    ref = hour_partials(new).toPandas()
    key = ["source", "_hr"]
    g = got.set_index(key).sort_index()
    r = ref.set_index(key).sort_index()
    # append mode may withhold the watermark tail; everything emitted
    # must be exact, and coverage must be substantial
    assert set(g.index) <= set(r.index)
    assert len(g) >= 0.8 * len(r)
    rr = r.loc[g.index]
    for col in ("_n", "_s", "_mx", "_mnts", "_mxts"):
        assert (g[col] == rr[col]).all(), col

    # merge the STREAMED partials into the persisted old-partial table
    streamed = spark.createDataFrame(got)
    for c in ("_mnts", "_mxts", "_hr"):
        streamed = streamed.withColumn(c, F.col(c).cast("timestamp_ntz"))
    merged = merge_hour_partials(hour_partials(old), streamed)
    inc = training_set_grid(None, partials=merged).toPandas()
    emitted_hours = set(map(tuple, got[key].itertuples(index=False)))
    full_parts = hour_partials(events).toPandas()
    covered = full_parts[
        full_parts.apply(
            lambda x: x._hr < cut or (x.source, x._hr) in emitted_hours,
            axis=1,
        )
    ]
    cov_spark = spark.createDataFrame(covered)
    for c in ("_mnts", "_mxts", "_hr"):
        cov_spark = cov_spark.withColumn(c, F.col(c).cast("timestamp_ntz"))
    ref_ts = training_set_grid(None, partials=cov_spark).toPandas()
    a = inc.sort_values(["source", "ts"]).reset_index(drop=True)
    b = ref_ts.sort_values(["source", "ts"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for col in a.columns:
        x, y = a[col], b[col]
        both_null = x.isna() & y.isna()
        assert (both_null | (x == y)).all(), col


def _ts_reference(spark, partials_store, horizon_hours=24):
    """One-shot training_set_grid over a partial store, filtered to the
    per-entity closed frontier — the rows stream_training_set promises."""
    from mhealth_spark.tokens_engine import training_set_grid

    closed = partials_store.groupBy("source").agg(
        F.max("_hr").alias("_frontier")
    )
    return (
        training_set_grid(None, partials=partials_store)
        .join(F.broadcast(closed), "source")
        .filter(
            F.col("ts") + F.expr(f"INTERVAL {horizon_hours} HOUR")
            <= F.col("_frontier")
        )
        .drop("_frontier")
        .toPandas()
    )


def _assert_frames_equal(a, b, key=("source", "ts")):
    key = list(key)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert set(a.columns) == set(b.columns)
    for col in a.columns:
        x, y = a[col], b[col]
        both_null = x.isna() & y.isna()
        assert (both_null | (x == y)).all(), col


def test_stream_training_set_incremental_retry_idempotent(spark, tmp_path):
    """The foreachBatch body's contracts, unit-tested on static partial
    batches: (1) two incremental batches emit exactly the one-shot
    training_set_grid rows within the final per-entity frontier, no
    duplicate (entity, hour) keys; (2) replaying a batch id (the
    at-least-once retry case) leaves the emitted set identical."""
    from mhealth_spark.streaming import _training_set_emit_fn
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import hour_partials

    events = spark.read.parquet(materialize_synth_tokens(spark, 500, seed=23))
    cut = dt.datetime(2024, 1, 4)
    p1 = hour_partials(events.filter(F.col("ts") < F.lit(cut)))
    p2 = hour_partials(events.filter(F.col("ts") >= F.lit(cut)))
    # the time cut must split cleanly on partial keys, like the stream's
    # once-per-window emission does
    k1 = {(r.source, r._hr) for r in p1.collect()}
    k2 = {(r.source, r._hr) for r in p2.collect()}
    assert k1 and k2 and not (k1 & k2)

    pdir, odir = str(tmp_path / "parts"), str(tmp_path / "train")
    emit = _training_set_emit_fn(pdir, odir)
    emit(p1, 0)
    first = spark.read.parquet(odir).drop("batch").toPandas()
    assert len(first) > 0
    emit(p2, 1)

    got = spark.read.parquet(odir).drop("batch").toPandas()
    assert not got.duplicated(["source", "ts"]).any()
    store = spark.read.parquet(pdir).drop("batch")
    _assert_frames_equal(got, _ts_reference(spark, store))
    # batch-0 rows were final at emission time: batch 1 never rewrites them
    _assert_frames_equal(
        first,
        got.merge(first[["source", "ts"]], on=["source", "ts"]),
    )

    # replay batch 1 (foreachBatch is at-least-once): output unchanged
    emit(p2, 1)
    again = spark.read.parquet(odir).drop("batch").toPandas()
    _assert_frames_equal(got, again)


def test_stream_training_set_stream_wiring(spark, tmp_path):
    """The packaged stream: file-source micro-batches through
    stream_training_set must land the same rows in the output store as
    the one-shot batch assembly over the final partial store."""
    from mhealth_spark.streaming import stream_training_set
    from mhealth_spark.synth import materialize_synth_tokens

    events = spark.read.parquet(materialize_synth_tokens(spark, 400, seed=29))
    cut = dt.datetime(2024, 1, 4)
    src = str(tmp_path / "events")
    events.filter(F.col("ts") < F.lit(cut)).write.parquet(f"{src}/f0")
    events.filter(F.col("ts") >= F.lit(cut)).write.parquet(f"{src}/f1")
    schema = spark.read.parquet(f"{src}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pdir, odir = str(tmp_path / "parts"), str(tmp_path / "train")
    q = (
        stream_training_set(stream, pdir, odir)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(odir).drop("batch").toPandas()
    assert len(got) > 0
    assert not got.duplicated(["source", "ts"]).any()
    store = spark.read.parquet(pdir).drop("batch").dropDuplicates(
        ["source", "_hr"]
    )
    _assert_frames_equal(got, _ts_reference(spark, store))


def test_stream_minhash_dedup_matches_sequential_greedy(spark, tmp_path):
    """The online near-dup gate must implement greedy first-survivor-wins
    over the SAME collision graph the batch candidate op emits: replaying
    the corpus as 3 ordered micro-batches (maxFilesPerTrigger=1) must
    reproduce a sequential Python greedy over batch
    ``minhash_lsh_candidates`` pairs exactly (is_dup AND dup_of), the
    index must hold survivors only, and a full re-run (fresh checkpoint,
    same dirs) must be byte-identical (replay idempotence)."""
    import os

    from mhealth_spark.pipelines.dedup import minhash_lsh_candidates
    from mhealth_spark.streaming import stream_minhash_dedup

    # 3 batches; heavy cross-batch and in-batch near-duplication
    tmpl = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "sphinx of black quartz judge my vow said the old librarian",
    ]

    def doc(i, t, extra):
        return (i, tmpl[t] + " " + extra)

    batches = [
        [doc(1, 0, "alpha"), doc(2, 1, "beta"), doc(3, 0, "alpha gamma")],
        [doc(10, 0, "alpha"), doc(11, 2, "delta"), doc(12, 1, "beta x")],
        [doc(20, 0, "alpha gamma"), doc(21, 2, "delta"), doc(22, 2, "unique epsilon zeta")],
    ]
    src = tmp_path / "src"
    src.mkdir()
    order = []
    import pyarrow as pa
    import pyarrow.parquet as pq

    for bi, rows in enumerate(batches):
        p = str(src / f"b{bi}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            ),
            p,
        )
        os.utime(p, (1700000000 + bi * 100, 1700000000 + bi * 100))
        order.extend(sorted(r[0] for r in rows))

    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    kw = dict(num_hashes=8, band_size=2, shingle_n=3, hash_fn="xxh")
    pairs = {
        (min(a, b), max(a, b))
        for a, b in minhash_lsh_candidates(all_docs, **kw)
        .select("id_a", "id_b")
        .collect()
    }
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)

    # sequential greedy reference in (batch, id) order, mirroring the
    # op's dup_of attribution (index hit wins over in-batch hit)
    expected = {}
    survivors: set = set()
    batch_of = {r[0]: bi for bi, rows in enumerate(batches) for r in rows}
    for v in order:
        hit_idx = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] < batch_of[v]
        )
        hit_in = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] == batch_of[v]
        )
        if hit_idx:
            expected[v] = (True, hit_idx[0])
        elif hit_in:
            expected[v] = (True, hit_in[0])
        else:
            expected[v] = (False, None)
            survivors.add(v)

    def run(tag):
        idx = str(tmp_path / f"idx_{tag}")
        out = str(tmp_path / f"out_{tag}")
        stream = (
            spark.readStream.schema(all_docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream_minhash_dedup(stream, idx, out, **kw)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["doc_id"]: (bool(r["is_dup"]), r["dup_of"])
            for r in spark.read.parquet(out).collect()
        }
        idx_ids = {
            r["doc_id"]
            for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
        }
        return got, idx_ids

    got, idx_ids = run("a")
    assert got == expected
    assert idx_ids == survivors  # survivor-only index
    assert any(d for d, _ in got.values())  # planted dups actually caught
    # replay idempotence: a fresh run over the same input is identical
    got2, idx2 = run("b")
    assert got2 == got and idx2 == idx_ids


def test_stream_semantic_dedup_matches_sequential_greedy(spark, tmp_path):
    """The online SemDeDup gate must implement greedy first-survivor-wins
    over the SAME intra-cluster cosine collision graph the batch op
    derives (fixed centroids): 3 ordered micro-batches must reproduce a
    sequential greedy over batch ``_semantic_pairs_from`` pairs exactly,
    the store must hold survivors only, and a re-run must be identical."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhealth_spark.pipelines.dedup import _semantic_pairs_from
    from mhealth_spark.pipelines.similarity import ivf_assign, pick_centroids
    from mhealth_spark.streaming import stream_semantic_dedup

    rng = np.random.RandomState(23)
    base = rng.randn(18, 10)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = {}
    ids = iter(range(1, 100))
    batches = [[], [], []]
    for i in range(18):
        vid = next(ids)
        vecs[vid] = base[i]
        batches[i % 3].append(vid)
    # plant near-duplicates across and within batches (cosine ~0.999)
    for src, tgt_batch in [(1, 1), (4, 2), (7, 0), (1, 2), (10, 1)]:
        vid = next(ids) + 50  # later ids than all originals
        d = vecs[src] + 0.01 * rng.randn(10)
        vecs[vid] = d / np.linalg.norm(d)
        batches[tgt_batch].append(vid)
    # plant EXACT copies (bit-identical vectors) in-batch and cross-batch
    # — exercises the gate's fingerprint pre-collapse member path
    for src, tgt_batch in [(2, 0), (2, 0), (5, 1), (2, 2)]:
        vid = next(ids) + 50
        vecs[vid] = vecs[src]
        batches[tgt_batch].append(vid)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    order = []
    for bi, vids in enumerate(batches):
        vids = sorted(vids)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(vids, pa.int64()),
                    "embedding": [
                        [float(x) for x in vecs[v]] for v in vids
                    ],
                }
            ),
            str(src_dir / f"b{bi}.parquet"),
        )
        os.utime(
            str(src_dir / f"b{bi}.parquet"),
            (1700000000 + bi * 100,) * 2,
        )
        order.extend(vids)

    all_emb = spark.createDataFrame(
        [(v, [float(x) for x in vecs[v]]) for v in sorted(vecs)],
        "vec_id long, embedding array<double>",
    )
    thr, ncl = 0.95, 4
    cents = pick_centroids(all_emb, ncl, salt="semstream")
    assigned = ivf_assign(all_emb, cents).select(
        F.col("vec_id").alias("id"), "cid"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in _semantic_pairs_from(assigned, all_emb, thr, "vec_id", "embedding")
        .select("id_a", "id_b")
        .collect()
    }
    nbrs = {}
    for x, y in pairs:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)

    batch_of = {v: bi for bi, vids in enumerate(batches) for v in vids}
    expected, survivors = {}, set()
    for v in order:
        hit_idx = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] < batch_of[v]
        )
        hit_in = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] == batch_of[v]
        )
        if hit_idx:
            expected[v] = (True, hit_idx[0])
        elif hit_in:
            expected[v] = (True, hit_in[0])
        else:
            expected[v] = (False, None)
            survivors.add(v)

    def run(tag):
        st = str(tmp_path / f"store_{tag}")
        out = str(tmp_path / f"out_{tag}")
        stream = (
            spark.readStream.schema(all_emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            stream_semantic_dedup(stream, cents, st, out, threshold=thr)
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["vec_id"]: (bool(r["is_dup"]), r["dup_of"])
            for r in spark.read.parquet(out).collect()
        }
        sids = {
            r["vec_id"]
            for r in spark.read.parquet(st).select("vec_id").distinct().collect()
        }
        return got, sids

    got, sids = run("a")
    assert got == expected
    assert sids == survivors
    assert sum(d for d, _ in got.values()) >= 4  # planted dups caught
    got2, sids2 = run("b")
    assert got2 == got and sids2 == sids


def test_compact_batch_store_continuation_equivalence(spark, tmp_path):
    """Compacting a gate's survivor index must not change any future
    decision: two identical streams diverge only in that one's store is
    compacted between runs; after new data arrives, their outputs and
    survivor sets must be identical. Also checks the snapshot protocol:
    folded dirs removed, negative generation created, running-stream
    safety (exclude_last leaves the frontier batch), and re-compaction
    folding a prior snapshot."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhealth_spark.streaming import compact_batch_store, stream_minhash_dedup

    tmpl = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "sphinx of black quartz judge my vow said the old librarian",
    ]
    batches = [
        [(1, tmpl[0] + " alpha"), (2, tmpl[1] + " beta")],
        [(10, tmpl[0] + " alpha"), (11, tmpl[2] + " delta")],
        [(20, tmpl[1] + " beta"), (21, tmpl[2] + " unique zeta")],
    ]
    continuation = [(30, tmpl[2] + " delta"), (31, tmpl[0] + " alpha"),
                    (32, "completely novel text with no template at all here")]
    src = tmp_path / "src"
    src.mkdir()

    def write_file(bi, rows):
        p = str(src / f"b{bi}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            ),
            p,
        )
        os.utime(p, (1700000000 + bi * 100,) * 2)

    for bi, rows in enumerate(batches):
        write_file(bi, rows)

    schema = "doc_id long, text string"
    # partitioned index mode: compaction must preserve the nested layout
    kw = dict(
        num_hashes=8, band_size=2, shingle_n=3, hash_fn="xxh",
        index_partitions=8,
    )

    def run(tag):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream_minhash_dedup(
                stream, str(tmp_path / f"idx_{tag}"), str(tmp_path / f"out_{tag}"), **kw
            )
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def state(tag):
        out = {
            (r["doc_id"], bool(r["is_dup"]), r["dup_of"])
            for r in spark.read.parquet(str(tmp_path / f"out_{tag}")).collect()
        }
        idx = {
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / f"idx_{tag}"))
            .drop("batch")
            .collect()
        }
        return out, idx

    run("x")
    run("y")
    assert state("x") == state("y")

    idx_y = str(tmp_path / "idx_y")
    res = compact_batch_store(
        spark, idx_y, exclude_last=False, partition_by=["pbucket"]
    )
    assert res["snapshot"] == -1 and sorted(res["folded"]) == [0, 1, 2]
    # only the snapshot partition remains (plus the gate's layout marker,
    # which batch-scheme readers ignore)
    assert [
        d for d in sorted(os.listdir(idx_y)) if d.startswith("batch=")
    ] == ["batch=-1"]
    assert state("x")[1] == state("y")[1]  # row set preserved

    write_file(3, continuation)
    run("x")
    run("y")
    assert state("x") == state("y")  # compaction changed no decision
    assert {
        d for d in os.listdir(idx_y) if d.startswith("batch=")
    } == {"batch=-1", "batch=3"}

    # running-stream safety: frontier batch is never folded
    res2 = compact_batch_store(
        spark, idx_y, exclude_last=True, partition_by=["pbucket"]
    )
    assert res2["folded"] == []
    # full re-compaction folds the prior snapshot into the next generation
    res3 = compact_batch_store(
        spark, idx_y, exclude_last=False, partition_by=["pbucket"]
    )
    assert res3["snapshot"] == -2 and sorted(res3["folded"]) == [-1, 3]
    assert [
        d for d in sorted(os.listdir(idx_y)) if d.startswith("batch=")
    ] == ["batch=-2"]
    assert state("x")[1] == state("y")[1]


def test_training_set_stores_survive_compaction(spark, tmp_path):
    """Compacting BOTH online training-set stores (partials and emitted
    output) between micro-batches must leave every future emission
    identical to the uncompacted twin — the partial store folds on its
    (entity, hour) key, and the emitted-frontier recovery reads the
    snapshot generation like any other batch directory."""
    from mhealth_spark.streaming import _training_set_emit_fn, compact_batch_store
    from mhealth_spark.synth import materialize_synth_tokens
    from mhealth_spark.tokens_engine import hour_partials

    events = spark.read.parquet(materialize_synth_tokens(spark, 500, seed=23))
    cuts = [dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)]
    parts = [
        hour_partials(events.filter(F.col("ts") < F.lit(cuts[0]))),
        hour_partials(
            events.filter(
                (F.col("ts") >= F.lit(cuts[0])) & (F.col("ts") < F.lit(cuts[1]))
            )
        ),
        hour_partials(events.filter(F.col("ts") >= F.lit(cuts[1]))),
    ]

    def run(tag, compact_after_1):
        pdir, odir = str(tmp_path / f"p_{tag}"), str(tmp_path / f"o_{tag}")
        emit = _training_set_emit_fn(pdir, odir)
        for bi, p in enumerate(parts):
            emit(p, bi)
            if bi == 1 and compact_after_1:
                rp = compact_batch_store(
                    spark, pdir, dedup_cols=["source", "_hr"], exclude_last=False
                )
                ro = compact_batch_store(spark, odir, exclude_last=False)
                assert rp["snapshot"] == -1 and ro["snapshot"] == -1
        return (
            spark.read.parquet(odir)
            .drop("batch")
            .toPandas()
            .sort_values(["source", "ts"])
            .reset_index(drop=True)
        )

    plain = run("plain", False)
    compacted = run("comp", True)
    _assert_frames_equal(plain, compacted)
    assert len(plain) > 0 and not plain.duplicated(["source", "ts"]).any()


def test_online_corpus_gate_composition(spark, tmp_path):
    """The full online ingest gate composed from existing pieces in ONE
    stream — quality_filter(keep_cols=True) -> stream_decontaminate ->
    stream_minhash_dedup — must equal the same stages applied in batch:
    the gate's output ids are exactly the quality+decontamination
    survivors, and dup decisions follow the sequential greedy over the
    batch collision graph restricted to those survivors."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhealth_spark.pipelines.corpus import decontaminate
    from mhealth_spark.pipelines.dedup import minhash_lsh_candidates
    from mhealth_spark.pipelines.text import quality_filter
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import stream_decontaminate, stream_minhash_dedup

    docs = (
        read_table(spark, "documents", "/root/testdata/sf0.001")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(120)
        .localCheckpoint(eager=True)
    )
    bench = docs.filter(F.col("doc_id") % 17 == 3).limit(5)

    # --- batch reference: stage filters, then sequential greedy ---
    kept_q = {r.doc_id for r in quality_filter(docs).filter("keep").collect()}
    kept_d = {
        r.doc_id
        for r in decontaminate(
            docs.join(
                spark.createDataFrame([(i,) for i in kept_q], "doc_id long"),
                "doc_id",
            ),
            bench,
        ).collect()
    }
    kw = dict(num_hashes=8, band_size=2, shingle_n=3, hash_fn="xxh")
    surv_docs = docs.filter(F.col("doc_id").isin(list(kept_d)))
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(surv_docs, **kw)
        .select("id_a", "id_b")
        .collect()
    }
    nbrs = {}
    for x, y in pairs:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)

    all_ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    files = [all_ids[:40], all_ids[40:80], all_ids[80:]]
    batch_of = {i: bi for bi, ids in enumerate(files) for i in ids}
    expected, survivors = {}, set()
    for ids in files:
        for v in ids:
            if v not in kept_d:
                continue
            hit_i = sorted(
                s for s in survivors & nbrs.get(v, set()) if batch_of[s] < batch_of[v]
            )
            hit_b = sorted(
                s for s in survivors & nbrs.get(v, set()) if batch_of[s] == batch_of[v]
            )
            if hit_i:
                expected[v] = (True, hit_i[0])
            elif hit_b:
                expected[v] = (True, hit_b[0])
            else:
                expected[v] = (False, None)
                survivors.add(v)

    # --- the composed stream ---
    src = tmp_path / "src"
    src.mkdir()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for bi, ids in enumerate(files):
        p = str(src / f"b{bi}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": [texts[i] for i in ids],
                }
            ),
            p,
        )
        os.utime(p, (1700000000 + bi * 100,) * 2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    gated = stream_decontaminate(
        quality_filter(stream, keep_cols=True).filter("keep"), bench
    )
    q = (
        stream_minhash_dedup(
            gated, str(tmp_path / "idx"), str(tmp_path / "out"), **kw
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (bool(r["is_dup"]), r["dup_of"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == expected
    assert len(kept_d) < len(kept_q) <= 120  # each stage actually filtered
    assert any(d for d, _ in got.values())  # the dedup stage actually fired


def test_stream_minhash_dedup_exact_flood_collapse(spark, tmp_path):
    """Mass-exact-duplicate batches (the crawler boilerplate case): the
    internal fingerprint pre-collapse must leave decisions EXACTLY equal
    to the uncollapsed sequential greedy — first copy survives, every
    other copy (in-batch and cross-batch) attributes to it, near-dups of
    the flooded text attribute to the surviving copy, and the index
    holds only the survivors."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhealth_spark.pipelines.dedup import minhash_lsh_candidates
    from mhealth_spark.streaming import stream_minhash_dedup

    boiler = "cookie notice please accept our terms and conditions to continue reading this site"
    other = "completely unrelated original article text about sphinx quartz judges and vows"
    b0 = [(i, boiler) for i in range(1, 31)] + [(31, other)]
    b1 = [(i, boiler) for i in range(40, 60)] + [
        (60, boiler + " extra tail words"),
        (61, other),
    ]
    batches = [b0, b1]

    src = tmp_path / "src"
    src.mkdir()
    order, batch_of = [], {}
    for bi, rows in enumerate(batches):
        p = str(src / f"b{bi}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            ),
            p,
        )
        os.utime(p, (1700000000 + bi * 100,) * 2)
        for r in rows:
            batch_of[r[0]] = bi
        order.extend(sorted(r[0] for r in rows))

    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    kw = dict(num_hashes=8, band_size=2, shingle_n=3, hash_fn="xxh")
    nbrs = {}
    for r in minhash_lsh_candidates(all_docs, **kw).collect():
        nbrs.setdefault(r.id_a, set()).add(r.id_b)
        nbrs.setdefault(r.id_b, set()).add(r.id_a)

    expected, survivors = {}, set()
    for v in order:
        hit_i = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] < batch_of[v]
        )
        hit_b = sorted(
            s for s in survivors & nbrs.get(v, set()) if batch_of[s] == batch_of[v]
        )
        if hit_i:
            expected[v] = (True, hit_i[0])
        elif hit_b:
            expected[v] = (True, hit_b[0])
        else:
            expected[v] = (False, None)
            survivors.add(v)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_minhash_dedup(
            stream, str(tmp_path / "idx"), str(tmp_path / "out"), **kw
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (bool(r["is_dup"]), r["dup_of"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == expected
    # the flood collapses to one survivor; 51 of 53 docs are dups of id 1
    assert sum(1 for d, o in got.values() if d and o == 1) >= 48
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "idx"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert idx_ids == survivors


def test_stream_semantic_dedup_zero_norm_vector_no_poison_pill(spark, tmp_path):
    """A zero-norm embedding (failed/padded vector) must not crash the
    gate under ANSI mode (DIVIDE_BY_ZERO would poison-pill every replay):
    the batch completes, the zero vector matches nothing (cosine
    undefined -> never a duplicate, kept), and normal vectors still
    dedup."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhealth_spark.pipelines.similarity import pick_centroids
    from mhealth_spark.streaming import stream_semantic_dedup

    rng = np.random.RandomState(5)
    v = rng.randn(6, 8)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = {i + 1: [float(x) for x in v[i]] for i in range(6)}
    rows[7] = [0.0] * 8          # the poison pill
    rows[8] = rows[1]            # exact dup (should still be caught)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(rows), pa.int64()),
                "embedding": [rows[k] for k in sorted(rows)],
            }
        ),
        str(src / "b0.parquet"),
    )
    emb = spark.createDataFrame(
        [(k, rows[k]) for k in sorted(rows) if k != 7],
        "vec_id long, embedding array<double>",
    )
    cents = pick_centroids(emb, 4, salt="zn")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(str(src))
    )
    q = (
        stream_semantic_dedup(
            stream, cents, str(tmp_path / "st"), str(tmp_path / "out"),
            threshold=0.95,
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        r["vec_id"]: bool(r["is_dup"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got[7] is False  # undefined cosine: never a duplicate
    assert got[8] is True and got[1] is False  # normal dedup unaffected


def test_minhash_index_probe_partition_pruning(spark, tmp_path):
    """The gate's survivor index is pbucket-partitioned and the probe
    join must reach its scan as a dynamic partition filter — per-batch
    index IO bounded by touched buckets, not store size."""
    from mhealth_spark.pipelines.dedup import minhash_index
    from mhealth_spark.source import read_table
    from mhealth_spark.streaming import _probe_minhash_index, _with_pbucket

    docs = (
        read_table(spark, "documents", "/root/testdata/sf0.001")
        .select("doc_id", "text")
        .limit(200)
    )
    idx = str(tmp_path / "idx")
    _with_pbucket(minhash_index(docs, shingle_n=3)).write.partitionBy(
        "pbucket"
    ).parquet(idx)
    store = spark.read.parquet(idx)
    nb = minhash_index(docs.filter("doc_id % 29 = 1"), shingle_n=3)
    probed = _probe_minhash_index(store, nb, "doc_id")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression(pbucket" in plan, plan
    assert probed.count() > 0  # the probe actually finds collisions


def test_quality_filter_keep_cols_name_clash_raises(spark):
    import pytest as _pt

    from mhealth_spark.pipelines.text import quality_filter

    df = spark.createDataFrame(
        [(1, "some text here", True)], "doc_id long, text string, keep boolean"
    )
    with _pt.raises(ValueError, match="keep"):
        quality_filter(df, keep_cols=True)
    # the narrow projection is unaffected by pre-existing names
    assert quality_filter(df).columns == ["doc_id", "keep", "reasons"]


def test_compact_batch_store_online_two_phase(spark, tmp_path):
    """The fully online compaction path: delete_folded=False leaves the
    folded directories next to the snapshot (duplicate-tolerant reads —
    no window where a concurrent reader can lose files), and a later
    call removes them once in-flight batches have drained."""
    import os

    from mhealth_spark.streaming import compact_batch_store

    for b in range(3):
        spark.createDataFrame(
            [(b * 10 + i, f"h{i}") for i in range(4)], "doc_id long, h string"
        ).write.parquet(str(tmp_path / "st" / f"batch={b}"))
    st = str(tmp_path / "st")

    res = compact_batch_store(spark, st, exclude_last=False, delete_folded=False)
    assert res["snapshot"] == -1 and sorted(res["folded"]) == [0, 1, 2]
    # snapshot AND folded dirs coexist: reads see duplicates, lose nothing
    assert sorted(os.listdir(st)) == ["batch=-1", "batch=0", "batch=1", "batch=2"]
    assert spark.read.parquet(st).count() == 24  # 12 rows twice
    assert spark.read.parquet(st).drop("batch").distinct().count() == 12

    # phase 2 (after in-flight batches drain): fold everything for real
    res2 = compact_batch_store(spark, st, exclude_last=False)
    assert res2["snapshot"] == -2 and res2["rows"] == 24
    assert sorted(os.listdir(st)) == ["batch=-2"]
    assert spark.read.parquet(st).drop("batch").distinct().count() == 12
