"""Synthesize a K×-scaled copy of an sf testdata directory for SCALE
MEASUREMENT ONLY (VERDICT r12 item 6: "produce scale evidence the sf0.1
bench can no longer give"). Never used by any query path or test — the
bench contract still reads $SPARK_GRAFT_SF_DIR.

Construction (deterministic, DuckDB + Python, no Spark):

- ``documents``: K copies; copy k shifts doc_id by k·STRIDE where
  STRIDE is a multiple of every doc_id modulus the operators use
  (lcm(1..20)·5·97), so every %-derived slice (bench/query/batch
  splits) keeps its exact proportions. Copy k>0 inserts a copy-salt
  token every 3rd word: with 5-token shingles every cross-copy shingle
  contains a salt, so cross-copy Jaccard ≈ 0 (the corpus's clean
  dup/noise gap is preserved) while WITHIN-copy near-dup pairs are
  salted identically and keep their base Jaccard — the dup structure
  scales linearly in K, the realistic regime, not quadratically in
  exact clones.
- ``embeddings``: vec_id shifted the same way; copy k>0 mixes the base
  vector with a hash-seeded unit perturbation at weights (0.4, 0.92)
  and re-normalizes, putting expected cross-copy cosine ≈ 0.4 <
  COSINE_THRESHOLD (0.45) — same linear-duplication argument.
- ``lineitem``/``orders``: order keys shifted jointly (join structure
  preserved); part/supp/cust keys, dates, flags untouched — the fact
  tables grow K× against fixed dims, the TPC-H scaling model. The C4.5
  training distributions are unchanged, so the model is identical and
  training measures pure scan/shuffle scaling.
- ``events``: event_id and user_id shifted — K× users with the same
  per-user session shape (linear sessionization).
- dims (region/nation/customer/supplier/part) copied as-is.

Usage: python scripts/make_scale_data.py [--k 10] [--src .../sf0.1]
           [--dst /tmp/sfbig_x10]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = math.lcm(*range(1, 21), 50, 97)  # honors every %-slice


def salt_text(text: str, k: int, doc_id: int) -> str:
    words = text.split(" ")
    salt = f"ck{k}x{doc_id % 13}"
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 3 == 2:
            out.append(salt)
    return " ".join(out)


def perturb(vec: np.ndarray, vec_id: int, k: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.md5(f"scale|{vec_id}|{k}".encode()).digest()[:8], "big"
    )
    r = np.random.default_rng(seed).standard_normal(len(vec))
    r /= np.linalg.norm(r)
    v = vec / max(np.linalg.norm(vec), 1e-12)
    out = 0.4 * v + 0.92 * r
    return (out / np.linalg.norm(out)).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfbig_x10")
    a = ap.parse_args()
    os.makedirs(a.dst, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{a.src}/{t}.parquet'))"
            f" TO '{a.dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    shifted = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifted.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{a.src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{a.src}/{t}.parquet'),"
            f" (SELECT UNNEST(GENERATE_SERIES(0, {a.k - 1})) AS k) k"
            f" ORDER BY k.k) TO '{a.dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    docs = con.execute(
        f"SELECT * FROM read_parquet('{a.src}/documents.parquet')"
    ).fetch_arrow_table()
    cols = {c: docs.column(c).to_pylist() for c in docs.column_names}
    out = {c: [] for c in docs.column_names}
    for k in range(a.k):
        for i in range(docs.num_rows):
            did = cols["doc_id"][i]
            text = (
                cols["text"][i]
                if k == 0
                else salt_text(cols["text"][i], k, did)
            )
            out["doc_id"].append(did + k * STRIDE)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text))
    pq.write_table(
        pa.table(out, schema=docs.schema), f"{a.dst}/documents.parquet"
    )

    emb = con.execute(
        f"SELECT * FROM read_parquet('{a.src}/embeddings.parquet')"
    ).fetch_arrow_table()
    vids = emb.column("vec_id").to_pylist()
    vecs = [np.array(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    labels = emb.column("label").to_pylist()
    o_v, o_e, o_l = [], [], []
    for k in range(a.k):
        for vid, v, lb in zip(vids, vecs, labels):
            o_v.append(vid + k * STRIDE)
            o_e.append((v if k == 0 else perturb(v, vid, k)).tolist())
            o_l.append(lb)
    pq.write_table(
        pa.table({"vec_id": o_v, "embedding": o_e, "label": o_l},
                 schema=emb.schema),
        f"{a.dst}/embeddings.parquet",
    )
    print(f"wrote {a.dst} at K={a.k} (stride {STRIDE})")


if __name__ == "__main__":
    main()
