#!/usr/bin/env python3
"""Deterministic sf1 extrapolation of the driver's documents/embeddings
tables (10x sf0.1), distribution-FITTED from /root/testdata/sf0.1 —
unigram token frequencies, lang/source mixes, doc-length empirical
distribution, near-dup/exact-dup rates, and per-label embedding
means/stds all measured from the real generator's output rather than
guessed. Seeded; byte-identical across runs. Other tables are symlinked
from sf0.1 (the curve set touches only documents/embeddings).

Usage: gen_sf1.py [outdir=/tmp/sf1_graft]
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_graft"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 100 -> sf10
SEED = 421

con = duckdb.connect()
doc = f"read_parquet('{SRC}/documents.parquet')"
emb = f"read_parquet('{SRC}/embeddings.parquet')"

# ---- fit document distributions ----
vocab_rows = con.execute(
    f"SELECT w, COUNT(*) c FROM (SELECT unnest(regexp_extract_all(lower(text),"
    f"'[a-z0-9]+')) w FROM {doc}) GROUP BY w ORDER BY w").fetchall()
vocab = [r[0] for r in vocab_rows]
wprob = np.array([r[1] for r in vocab_rows], dtype=float)
wprob /= wprob.sum()
langs = con.execute(f"SELECT lang, COUNT(*) FROM {doc} GROUP BY lang ORDER BY lang").fetchall()
lnames = [r[0] for r in langs]
lprob = np.array([r[1] for r in langs], dtype=float); lprob /= lprob.sum()
sources = con.execute(f"SELECT source, COUNT(*) FROM {doc} GROUP BY source ORDER BY source").fetchall()
snames = [r[0] for r in sources]
sprob = np.array([r[1] for r in sources], dtype=float); sprob /= sprob.sum()
lens = [r[0] for r in con.execute(
    f"SELECT len(regexp_extract_all(lower(text),'[a-z0-9]+')) FROM {doc}").fetchall()]
n_docs_src, = con.execute(f"SELECT COUNT(*) FROM {doc}").fetchone()
n_exact, = con.execute(
    f"SELECT COUNT(*) - COUNT(DISTINCT text) FROM {doc}").fetchone()
n_near, = con.execute(
    f"SELECT COUNT(*) FROM (SELECT substr(text,1,80) p, COUNT(*) c FROM {doc}"
    f" GROUP BY p HAVING c>1)").fetchone()
p_exact = n_exact / n_docs_src
p_near = n_near / n_docs_src

rng = np.random.default_rng(SEED)
N = n_docs_src * SCALE
texts, dlangs, dsrcs = [], [], []
for i in range(N):
    r = rng.random()
    if i > 0 and r < p_exact:                 # exact duplicate
        j = int(rng.integers(0, i))
        texts.append(texts[j]); dlangs.append(dlangs[j]); dsrcs.append(
            snames[int(rng.choice(len(snames), p=sprob))])
    elif i > 0 and r < p_exact + p_near:      # near duplicate: keep head,
        j = int(rng.integers(0, i))           # resample the tail tokens
        toks = texts[j].split(" ")
        cut = max(1, int(len(toks) * (0.6 + 0.3 * rng.random())))
        tail = list(rng.choice(vocab, size=max(0, len(toks) - cut), p=wprob))
        texts.append(" ".join(toks[:cut] + tail))
        dlangs.append(dlangs[j])
        dsrcs.append(snames[int(rng.choice(len(snames), p=sprob))])
    else:
        n = lens[int(rng.integers(0, len(lens)))]
        texts.append(" ".join(rng.choice(vocab, size=n, p=wprob)))
        dlangs.append(lnames[int(rng.choice(len(lnames), p=lprob))])
        dsrcs.append(snames[int(rng.choice(len(snames), p=sprob))])

os.makedirs(OUT, exist_ok=True)
pq.write_table(pa.table({
    "doc_id": pa.array(range(N), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(dlangs, pa.string()),
    "source": pa.array(dsrcs, pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")

# ---- fit embedding distributions: per-label mean + per-dim std ----
lab_rows = con.execute(
    f"SELECT label, COUNT(*) FROM {emb} GROUP BY label ORDER BY label").fetchall()
labels = [r[0] for r in lab_rows]
labp = np.array([r[1] for r in lab_rows], dtype=float); labp /= labp.sum()
M, = con.execute(f"SELECT COUNT(*) FROM {emb}").fetchone()
M *= SCALE
dims, = con.execute(f"SELECT MAX(len(embedding)) FROM {emb}").fetchone()
means, stds = {}, {}
for lab in labels:
    vecs = np.array([r[0] for r in con.execute(
        f"SELECT embedding FROM {emb} WHERE label = {lab}").fetchall()],
        dtype=np.float64)
    means[lab] = vecs.mean(axis=0)
    stds[lab] = vecs.std(axis=0)
elabs = rng.choice(labels, size=M, p=labp)
vecs = np.empty((M, dims), dtype=np.float32)
for i, lab in enumerate(elabs):
    vecs[i] = (means[lab] + rng.standard_normal(dims) * stds[lab]).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": pa.array(range(M), pa.int64()),
    "embedding": pa.array([v for v in vecs.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array([int(l) for l in elabs], pa.int32()),
}), f"{OUT}/embeddings.parquet")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print(f"wrote {OUT}: {N} docs, {M} embeddings ({dims}d), "
      f"p_exact={p_exact:.4f} p_near={p_near:.4f}")
