"""Generate an sf1.0-shaped testdata tier at /tmp/testdata_sf1 (the
driver's /root/testdata is read-only and tops out at sf0.1).

Purpose: VERDICT r2 #10 — re-run the bench sweep at 10x volume to surface
plans that only misbehave with real shuffle volume. Correctness stays
gated at sf0.01 (DuckDB oracles); this tier is for stress/bench only.

Construction (deterministic, no RNG state beyond per-row seeds):
- region/nation: copied verbatim (dimensions).
- customer/supplier/part/orders/lineitem/events: 10 replicas with
  consistent key offsets (foreign keys shift together, so joins behave
  exactly as at sf0.1 but with 10x rows and 10x distinct keys).
- documents: 50,000 freshly generated docs over the sf0.1 vocabulary —
  independent corpus with the same shape (20 sources, 5 langs, ~50-word
  docs, ~0.2%% exact dups, ~0.25%% near-dups). NOT replicated copies:
  replication would square the dup-cluster sizes and distort every LSH
  workload.
- embeddings: 20,000 fresh 64-dim float32 vectors, 10 gaussian label
  clusters (same structure as the sf0.1 table).

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/testdata_sf1)
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def t(name: str) -> str:
    return f"'{SRC}/{name}.parquet'"


def replicate(con, name: str, out: str, key_shifts: dict[str, str]) -> None:
    """10 replicas; each listed column is shifted by r * (max+1) of its
    base column so keys stay dense and foreign keys stay consistent."""
    maxes = {
        col: con.execute(
            f"SELECT max({base}) + 1 FROM {t(base_table)}"
        ).fetchone()[0]
        for col, (base_table, base) in key_shifts.items()
    }
    cols = [
        r[0]
        for r in con.execute(f"DESCRIBE SELECT * FROM {t(name)}").fetchall()
    ]
    sel = ", ".join(
        f"{c} + r.r * {maxes[c]} AS {c}" if c in maxes else c for c in cols
    )
    con.execute(
        f"COPY (SELECT {sel} FROM {t(name)}, range({REPLICAS}) r(r)) "
        f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
    )


def gen_documents(out: str, n: int = 50_000) -> None:
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) "
            f"FROM {t('documents')}"
        ).fetchall()
        if r[0]
    ]
    vocab.sort()
    langs = ["en", "en", "en", "en", "zh", "es", "de", "fr"]
    rows_id, rows_text, rows_lang, rows_src = [], [], [], []
    prev_text = ""
    for i in range(n):
        rng = random.Random(1_000_000 + i)
        if i % 600 == 599 and prev_text:
            text = prev_text  # exact duplicate
        elif i % 400 == 399 and prev_text:
            w = prev_text.split()
            w[rng.randrange(len(w))] = rng.choice(vocab)  # near-duplicate
            text = " ".join(w)
        else:
            ln = rng.randint(40, 65)
            # Zipf-ish: quadratic index skew toward the vocab head
            text = " ".join(
                vocab[int(rng.random() ** 2 * len(vocab))] for _ in range(ln)
            )
        rows_id.append(i)
        rows_text.append(text)
        rows_lang.append(langs[rng.randrange(len(langs))])
        rows_src.append(f"src{rng.randrange(20)}")
        prev_text = text
    tbl = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
            "source": pa.array(rows_src, pa.string()),
            "n_chars": pa.array([len(x) for x in rows_text], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(out: str, n: int = 20_000, dim: int = 64) -> None:
    """Random UNIT vectors (matching the driver tables: intra-label mean
    cosine ~0 — no cluster structure; the 0.4-threshold pair set is the
    intrinsic n² background tail) plus PLANTED near-dup pairs at cosine
    in [0.55, 0.97] every 20th vector, so the true near-dup regime
    (threshold >= 0.85) has real answers at this tier."""
    rs = np.random.RandomState(4242)
    vecs = rs.randn(n, dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(19, n, 20):
        c = 0.55 + 0.42 * ((i * 2654435761) % 1000) / 1000.0
        noise = rs.randn(dim)
        noise -= noise.dot(vecs[i - 1]) * vecs[i - 1]
        noise /= np.linalg.norm(noise)
        vecs[i] = c * vecs[i - 1] + np.sqrt(1.0 - c * c) * noise
    vecs = vecs.astype(np.float32)
    labels = rs.randint(0, 10, size=n)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(vecs), pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {t(name)}) "
            f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
    replicate(con, "customer", out, {"c_custkey": ("customer", "c_custkey")})
    replicate(con, "supplier", out, {"s_suppkey": ("supplier", "s_suppkey")})
    replicate(con, "part", out, {"p_partkey": ("part", "p_partkey")})
    replicate(
        con,
        "orders",
        out,
        {
            "o_orderkey": ("orders", "o_orderkey"),
            "o_custkey": ("customer", "c_custkey"),
        },
    )
    replicate(
        con,
        "lineitem",
        out,
        {
            "l_orderkey": ("orders", "o_orderkey"),
            "l_partkey": ("part", "p_partkey"),
            "l_suppkey": ("supplier", "s_suppkey"),
        },
    )
    replicate(
        con,
        "events",
        out,
        {
            "event_id": ("events", "event_id"),
            "user_id": ("events", "user_id"),
        },
    )
    gen_documents(out)
    gen_embeddings(out)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        n = duckdb.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
