"""Distributed BPE vocabulary learning over the pre-tokenized table.

The reference repo has no tokenizer-training surface, but a
training-data engine over ``(doc_id, tokens, n_tok, source)`` (the
BASELINE.json input table) needs the canonical BPE loop (Sennrich et
al. 2016): count adjacent token pairs corpus-wide, pick the most
frequent pair, replace its greedy left-to-right non-overlapping
occurrences with a fresh token id, repeat. Everything here is
DataFrame-native:

- **counting** reuses the packed-long bigram shape from
  ``corpus.bigram_logprob_scores`` — pairs become ONE fixed-width join
  key via shifted ``slice`` + ``zip_with`` (see the no-CSE note there),
  exploded and counted with map-side partial aggregation. The shuffle
  carries only distinct ``(pair, partial_count)`` rows.
- **argmax** is an ``orderBy(count DESC, a, b).limit(k)`` over the
  counted pairs — a total order, so merge selection is deterministic
  under ties on any cluster layout.
- **merge application** is a per-row expression — ZERO shuffle, no
  Python. Greedy left-to-right semantics need a sequential scan, but
  only over the *match positions*, which are sparse: a bounded
  ``aggregate`` fold over ``filter(sequence(1, n-1), ...)`` carries
  (selected-positions, last-selected) and skips a match that overlaps
  the previously selected one. Rebuilding the array is a relational
  ``filter`` + ``transform`` over indices (drop ``j`` when ``j-1`` was
  selected; rewrite ``j`` to the new id when selected). Cost is
  O(n + n·m) per row with m = matches-per-doc (tiny); the lambda bodies
  are pure arithmetic/comparisons, which stay cheap interpreted (the
  HOF rule: no md5/regex inside lambdas).

At 100 TB each learn step is one scan + one tiny all-to-one argmax
(partial-agg'd, k rows collected) — the same communication pattern as
production BPE trainers; the merge rewrite is embarrassingly parallel.
For hundreds of merges, ``learn_bpe`` localCheckpoints every
``checkpoint_every`` steps so the plan does not grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BIG = 4294967296  # 2^32 — pack (a, b) into one long; token ids < 2^31


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Corpus-wide adjacent-pair counts → ``(a, b, cnt)``.

    Overlapping occurrences all count (standard BPE counting: "aaa"
    contributes (a,a) twice even though only one merge can apply).
    """
    t = F.col(tokens_col)
    n = F.size(t)
    pairs = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda x, y: x.cast("long") * F.lit(_BIG) + y.cast("long"),
    )
    ex = df.filter(n >= 2).select(F.explode(pairs).alias("pair"))
    return (
        ex.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.expr(f"pair DIV {_BIG}").cast("int").alias("a"),
            (F.col("pair") % F.lit(_BIG)).cast("int").alias("b"),
            "cnt",
        )
    )


def top_pairs(df: DataFrame, k: int, tokens_col: str = "tokens") -> DataFrame:
    """Top-``k`` merge candidates, totally ordered (cnt DESC, a, b) so
    rank assignment is deterministic under count ties."""
    ranked = pair_counts(df, tokens_col).orderBy(
        F.desc("cnt"), "a", "b"
    ).limit(k)
    w = Window.orderBy(F.desc("cnt"), "a", "b")
    # the window runs on <= k rows (post-limit) — single tiny task
    return ranked.select(
        F.row_number().over(w).alias("rank"), "a", "b", "cnt"
    )


def _selected_positions(tokens_col: str, a: int, b: int):
    """Column: 1-based positions of greedy-selected (a, b) matches."""
    t = F.col(tokens_col)
    n = F.size(t)
    aL, bL = F.lit(int(a)), F.lit(int(b))
    empty = F.array().cast("array<int>")
    # 1-based positions j where t[j]=a and t[j+1]=b (sequence(1, n-1)
    # would count DOWN for n=1 — guard)
    matches = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(empty)
    matches = F.filter(
        matches,
        lambda j: (F.element_at(t, j) == aL) & (F.element_at(t, j + 1) == bL),
    )
    # greedy selection: fold over the sparse match list carrying
    # (selected, last_selected); a match at last+1 overlaps the pair
    # consumed at `last` and is skipped (e.g. "aaa" under merge (a,a)
    # merges once). The accumulator only grows by selected matches, so
    # the fold is O(m^2) worst-case with m = matches-per-doc, not O(n^2).
    return F.aggregate(
        matches,
        F.struct(empty.alias("s"), F.lit(-2).alias("last")),
        lambda acc, j: F.when(j == acc["last"] + 1, acc).otherwise(
            F.struct(
                F.concat(acc["s"], F.array(j)).alias("s"),
                j.alias("last"),
            )
        ),
        lambda acc: acc["s"],
    )


def _rebuild(tokens_col: str, sel_col: str, new_id: int):
    """Column: tokens rebuilt from a MATERIALIZED selection column —
    drop j when j-1 selected, rewrite selected j to ``new_id``."""
    t = F.col(tokens_col)
    n = F.size(t)
    sel = F.col(sel_col)
    nidL = F.lit(int(new_id))
    empty = F.array().cast("array<int>")
    out = F.filter(
        F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty),
        lambda j: ~F.array_contains(sel, j - 1),
    )
    return F.transform(
        out,
        lambda j: F.when(F.array_contains(sel, j), nidL)
        .otherwise(F.element_at(t, j))
        .cast("int"),
    )


def apply_merge(
    df: DataFrame, a: int, b: int, new_id: int, tokens_col: str = "tokens"
) -> DataFrame:
    """One BPE merge applied corpus-wide (narrow map — zero shuffle).

    The selection fold is materialized as its OWN projection before the
    rebuild references it per-element: Catalyst does no CSE across
    lambdas, so inlining the fold into ``filter``/``transform`` bodies
    re-evaluates it once per array element — measured minutes-vs-seconds
    at 3k docs. CollapseProject keeps non-cheap multi-referenced
    expressions in their own projection, so the two-step survives
    optimization (same lesson as the simhash/minhash one-struct folds).
    """
    sel = _selected_positions(tokens_col, a, b)
    return (
        df.withColumn("_bpe_sel", sel)
        .withColumn(tokens_col, _rebuild(tokens_col, "_bpe_sel", new_id))
        .drop("_bpe_sel")
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    start_id: int,
    tokens_col: str = "tokens",
) -> tuple[list[tuple[int, int, int, int, int]], DataFrame]:
    """The BPE training loop: ``n_merges`` rounds of (count → argmax →
    apply). Returns ``(merges, final_df)`` where merges is
    ``[(step, a, b, new_id, cnt), ...]`` (1-based step).

    Each round's driver collect is exactly ONE row (the argmax after
    map-side combine) — the scan dominates, as in production BPE.

    Lineage is cut with ``localCheckpoint`` after EVERY apply: the next
    round's pair explode references the rebuilt-tokens expression ~5×
    (two shifted slices, two lengths, a filter), and Catalyst's
    projection collapse + filter pushdown re-inline the non-trivial
    rebuild per reference — without the cut, round t replays rounds
    1..t-1 with ~5× fan-out per level (measured: a 3-merge loop at 3k
    docs went from minutes-hang to ~9 s). Materializing each round's
    rewritten corpus is also what production BPE trainers do; on a real
    cluster this would be a persisted table per round.
    """
    merges: list[tuple[int, int, int, int, int]] = []
    cur = df
    for step in range(1, n_merges + 1):
        top = top_pairs(cur, 1, tokens_col).collect()
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["cnt"])
        nid = start_id + step - 1
        merges.append((step, a, b, nid, cnt))
        cur = apply_merge(cur, a, b, nid, tokens_col).localCheckpoint(
            eager=False
        )
    return merges, cur
