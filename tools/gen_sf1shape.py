#!/usr/bin/env python3
"""Generate an sf1-SHAPED dataset (10x sf0.1) for the one-shot scale-up
bench (bench/r11_sf1_once.json).

The driver ships sf0.001/0.01/0.1 only; the 2x perf target is therefore
only ever measured at sf0.1, where constant factors can hide super-linear
behavior. This tool builds a 10x dataset from sf0.1 itself so the full
query surface can be timed one decade up:

- region/nation: copied (fixed dimensions).
- customer/supplier/part/orders/lineitem/events: 10 SELF-CONTAINED
  replicas with primary/foreign keys offset by replica * (max_key + 1),
  so every join cardinality scales exactly 10x and per-key distributions
  are preserved verbatim.
- documents: replica 0 verbatim (keeps the original near-dup families);
  replicas 1-9 resample each document's tokens i.i.d. from the sf0.1
  vocabulary unigram distribution at the original token count (so length
  and vocabulary marginals match, but replicas are NOT near-dups of the
  originals — naive text replication would multiply every dedup miner's
  candidate volume ~50x and destroy the distribution instead of scaling
  it). The sf0.1 exact-duplicate rate (8/5000) is re-planted per replica.
- embeddings: replica 0 verbatim; replicas 1-9 add N(0, (0.1*std)^2)
  per-dimension noise (cluster structure preserved, no exact-dup blowup).

Deterministic (numpy seed 42). NOT driver data: artifacts produced from
it are labeled sf1-shaped, and correctness is never gated on it.

Usage: python3 tools/gen_sf1shape.py [outDir=/tmp/sf1shape]
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1shape"
R = 10  # replicas = 10x scale

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
rng = np.random.default_rng(42)


def copy(table):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{OUT}/{table}.parquet'"
    )


def replicate(table, offsets):
    """10 self-contained replicas; `offsets` maps column -> key-space size."""
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + r.r * {offsets[c]} AS {c}" if c in offsets else c for c in cols)
    con.execute(
        f"""COPY (SELECT {sel}
                  FROM '{SRC}/{table}.parquet', range({R}) AS r(r))
             TO '{OUT}/{table}.parquet'""")


copy("region")
copy("nation")
replicate("customer", {"c_custkey": 15000})
replicate("supplier", {"s_suppkey": 1000})
replicate("part", {"p_partkey": 20000})
replicate("orders", {"o_orderkey": 150000, "o_custkey": 15000})
replicate("lineitem", {"l_orderkey": 150000, "l_partkey": 20000,
                       "l_suppkey": 1000})
replicate("events", {"event_id": 100000})

# documents: replica 0 verbatim, replicas 1-9 vocabulary-resampled
docs = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars "
    f"FROM '{SRC}/documents.parquet' ORDER BY doc_id").fetchall()
texts = [d[1] for d in docs]
tok_lists = [t.split(" ") for t in texts]
vocab, counts = np.unique(
    np.concatenate([np.array(t) for t in tok_lists]), return_counts=True)
probs = counts / counts.sum()
n_docs = len(docs)
dup_ids = sorted(rng.choice(np.arange(1, n_docs), size=8, replace=False))

out_rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for rep in range(R):
    if rep == 0:
        for (i, t, lang, src, _nc) in docs:
            out_rows["doc_id"].append(i)
            out_rows["text"].append(t)
            out_rows["lang"].append(lang)
            out_rows["source"].append(src)
            out_rows["n_chars"].append(len(t))
    else:
        new_texts = []
        for i in range(n_docs):
            n_tok = len(tok_lists[i])
            words = rng.choice(vocab, size=n_tok, p=probs)
            new_texts.append(" ".join(words))
        for d in dup_ids:  # re-plant the sf0.1 exact-dup rate
            new_texts[d] = new_texts[d - 1]
        for i in range(n_docs):
            out_rows["doc_id"].append(rep * n_docs + i)
            out_rows["text"].append(new_texts[i])
            out_rows["lang"].append(docs[i][2])
            out_rows["source"].append(docs[i][3])
            out_rows["n_chars"].append(len(new_texts[i]))
pq.write_table(pa.table({
    "doc_id": pa.array(out_rows["doc_id"], pa.int64()),
    "text": pa.array(out_rows["text"], pa.string()),
    "lang": pa.array(out_rows["lang"], pa.string()),
    "source": pa.array(out_rows["source"], pa.string()),
    "n_chars": pa.array(out_rows["n_chars"], pa.int64()),
}), f"{OUT}/documents.parquet")

# embeddings: replica 0 verbatim, replicas 1-9 jittered
emb_tbl = pq.read_table(f"{SRC}/embeddings.parquet")
vec_ids = emb_tbl.column("vec_id").to_numpy()
labels = emb_tbl.column("label").to_numpy()
embs = np.array(emb_tbl.column("embedding").to_pylist(), dtype=np.float32)
n_vec, dim = embs.shape
sigma = 0.1 * embs.std(axis=0)
all_ids, all_embs, all_labels = [vec_ids], [embs], [labels]
for rep in range(1, R):
    all_ids.append(vec_ids + rep * n_vec)
    all_embs.append(
        (embs + rng.normal(0, sigma, size=embs.shape)).astype(np.float32))
    all_labels.append(labels)
pq.write_table(pa.table({
    "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
    "embedding": pa.array(list(np.concatenate(all_embs)),
                          pa.list_(pa.float32())),
    "label": pa.array(np.concatenate(all_labels), pa.int32()),
}), f"{OUT}/embeddings.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = pq.ParquetFile(f"{OUT}/{t}.parquet").metadata.num_rows
    print(f"{t}: {n} rows")
print(f"sf1-shaped dataset written to {OUT}")
