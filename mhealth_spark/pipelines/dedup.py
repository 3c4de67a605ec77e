"""Deduplication for training-data pipelines (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup).

Scale notes (100 TB posture):
- exact dedup is a hash groupBy — one shuffle on the fingerprint; at
  scale, pre-partition by fingerprint prefix and use AQE skew splitting
  for pathological duplicates (boilerplate pages).
- MinHash+LSH: shingle → k minhashes → band buckets → equi-JOIN on
  (band, bucket) — the cross product only forms inside buckets, never
  globally. Candidates are then verified with exact Jaccard.
- all-pairs n-gram Jaccard (``ngram_jaccard_pairs``) is the small-data /
  verification tool: the inverted-index self-join bounds the blowup to
  docs sharing a shingle, but at web scale you run MinHash first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mhealth_spark.pipelines.text import shingles_col, words_col


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by normalized-text md5: per doc, its group's size and
    canonical (min-id) representative. Keep rows where doc_id == keep_id."""
    norm = F.concat_ws(" ", words_col(text_col))
    fp = df.select(F.col(id_col), F.md5(norm).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.count("*").alias("group_size"), F.min(id_col).alias("keep_id")
    )
    return fp.join(groups, "fp").select(id_col, "group_size", "keep_id")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """k MinHash values per doc over word n-gram shingles.

    hash_fn='md5' → string minima, byte-identical in DuckDB oracles;
    hash_fn='xxh' → 64-bit minima (the scale path: 8 bytes/hash, JVM-only).
    Docs with no shingles are dropped (no signature).
    """
    sh = shingles_col(text_col, shingle_n)
    base = df.select(F.col(id_col), sh.alias("sh")).filter(F.size("sh") > 0)

    # NB: closures via factory functions, NOT default args — PySpark
    # introspects lambda arity, and `lambda s, i=i:` becomes the 2-arg
    # (element, index) form with the array index bound to i.
    def md5_hasher(i: int):
        return lambda s: F.md5(F.concat(s, F.lit(f"#{i}")))

    def xxh_hasher(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    hasher = md5_hasher if hash_fn == "md5" else xxh_hasher
    mins = [
        F.array_min(F.transform("sh", hasher(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return base.select(id_col, *mins)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair
    (id_a < id_b). The join key is (band_index, band_hash) — a plain
    shuffled equi-join; no global cross product."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, hash_fn)
    bands = []
    n_bands = num_hashes // band_size
    for b in range(n_bands):
        cols = [f"mh{b * band_size + j}" for j in range(band_size)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    exploded = bands[0]
    for b in bands[1:]:
        exploded = exploded.unionByName(b)
    a = exploded.alias("a")
    bb = exploded.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard over an inverted-index self-join:
    |A∩B| from shared shingles, |A|,|B| from per-doc distinct counts."""
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_n)).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")


def simhash16(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash from the high bit of each md5 hex digit per word
    (parity tier — byte-identical in SQL). The scale path is
    ``simhash64``."""
    w = words_col(text_col)
    high = list("89abcdef")

    def contrib_fn(j: int):
        return lambda acc, x: acc + F.when(
            F.substring(F.md5(x), j + 1, 1).isin(high), F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for j in range(16):
        contrib = F.aggregate(w, F.lit(0), contrib_fn(j))
        bit_cols.append(F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)))
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig * 2 + b
    return df.select(F.col(id_col), sig.cast("long").alias("simhash16"))


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash via xxhash64 word hashes (scale path). Near-dups =
    signatures within small Hamming distance; bucket by bit-blocks for
    sub-quadratic search."""
    w = words_col(text_col)

    def contrib_fn(j: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(F.xxhash64(x), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for j in range(64):
        contrib = F.aggregate(w, F.lit(0), contrib_fn(j))
        bits.append(F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"))
    sig = bits[0]
    for b in bits[1:]:
        sig = F.shiftleft(sig, 1) + b
    return df.select(F.col(id_col), sig.alias("simhash64"))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).
    Brute-force self-join — the verification tier; at scale bucket first
    (see similarity.ann_lsh_bucketed)."""
    from mhealth_spark.pipelines.similarity import cosine_expr

    v = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
