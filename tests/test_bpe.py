"""BPE family (pipelines/bpe.py): greedy merge-apply parity against a
pure-Python reference (the textbook left-to-right scan), counting
semantics, and the learn loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhealth_spark.pipelines import bpe


def _py_merge(toks: list[int], a: int, b: int, nid: int) -> list[int]:
    """Textbook greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


CASES = [
    [1, 2, 3, 1, 2],          # two disjoint matches
    [1, 1, 1],                # overlap run (a=b): merge once
    [1, 1, 1, 1],             # even run: merge twice
    [1, 1, 1, 1, 1],          # odd run: twice, trailing 1
    [2, 1, 2, 1, 2],          # aba chain with a!=b
    [1, 2],                   # whole doc is one match
    [3],                      # single token, no pairs
    [1, 2, 1, 2, 1, 2],       # back-to-back matches at 0,2,4 (all fire)
    [5, 1, 2, 2, 1, 2, 5],    # match then shifted near-match
    [2, 2, 1, 1, 2, 2],       # match of (1,1) inside other runs
]


@pytest.mark.parametrize("a,b,nid", [(1, 2, 99), (1, 1, 99), (2, 2, 99)])
def test_merge_expr_matches_python_greedy(spark, a, b, nid):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id int, tokens array<int>"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe.apply_merge(df, a, b, nid).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _py_merge(t, a, b, nid), (a, b, t, got[i])


def test_merge_expr_differential_random(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.randrange(4) for _ in range(rng.randrange(0, 40))])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe.apply_merge(df, 1, 2, 99).collect()
    }
    for i, t in rows:
        assert got[i] == _py_merge(t, 1, 2, 99)


def test_pair_counts_overlapping(spark):
    df = spark.createDataFrame(
        [(0, [1, 1, 1]), (1, [1, 2, 1, 2]), (2, [7])],
        "doc_id int, tokens array<int>",
    )
    got = {
        (r["a"], r["b"]): r["cnt"] for r in bpe.pair_counts(df).collect()
    }
    # "aaa" contributes (1,1) twice — standard overlapping BPE counting
    assert got == {(1, 1): 2, (1, 2): 2, (2, 1): 1}


def test_learn_bpe_loop(spark):
    # corpus where the merge cascade is knowable: (1,2) dominates, then
    # the merged id 50 pairs with 3
    rows = [(i, [1, 2, 3, 1, 2, 3, 1, 2]) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    merges, final = bpe.learn_bpe(df, 2, 50)
    assert merges[0][1:] == (1, 2, 50, 60)  # (a, b, new_id, cnt): 3 per doc
    # after merge 1: [50,3,50,3,50] — (50,3) and (3,50) tie at 40;
    # the total order (cnt DESC, a, b) deterministically picks (3,50)
    assert merges[1][1:] == (3, 50, 51, 40)
    out = final.orderBy("doc_id").limit(1).collect()[0]["tokens"]
    assert out == [50, 51, 51]


def test_learn_bpe_stops_when_dry(spark):
    # all-distinct tokens: max pair count is 1 < 2 → no merges learned
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4, 5])], "doc_id int, tokens array<int>"
    )
    merges, final = bpe.learn_bpe(df, 5, 100)
    assert merges == []
    assert final.select(F.col("tokens")).collect()[0][0] == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# CDC chunking (lives here to reuse the session fixture; see
# pipelines/dedup.py cdc_chunks)
# ---------------------------------------------------------------------------
def _mk_text(rng, n):
    return " ".join(f"w{rng.randrange(200)}" for _ in range(n))


def test_cdc_chunks_reconstruct(spark):
    import random

    rng = random.Random(11)
    rows = [(i, _mk_text(rng, rng.randrange(30, 200))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from mhealth_spark.pipelines.dedup import cdc_chunks

    ch = cdc_chunks(df).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        got = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # chunk ids contiguous from 0; word counts cover the doc exactly
        assert [r["chunk_id"] for r in got] == list(range(len(got)))
        assert sum(r["n_words"] for r in got) == len(text.split())


def test_cdc_shift_resilience(spark):
    import random

    rng = random.Random(13)
    base = _mk_text(rng, 400)
    shifted = "INSERTED " + base  # one-word insertion at the head
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id int, text string"
    )
    from mhealth_spark.pipelines.dedup import cdc_chunks, cdc_dup_stats

    ch = cdc_chunks(df).collect()
    h0 = {r["chunk_hash"] for r in ch if r["doc_id"] == 0}
    h1 = {r["chunk_hash"] for r in ch if r["doc_id"] == 1}
    # boundaries resync after the first boundary -> almost all chunks
    # shared despite every fixed-stride span being shifted
    shared = h0 & h1
    assert len(shared) >= max(len(h0) - 2, 1), (len(h0), len(shared))
    stats = {r["doc_id"]: r for r in cdc_dup_stats(df).collect()}
    assert stats[0]["dup_word_ratio"] > 0.9
    assert stats[1]["n_dup_chunks"] >= len(shared)
