#!/usr/bin/env python3
"""Generate the SCALING.md corpora: documents/embeddings at sf0.5 and
sf1, derived from the driver's sf0.1 tables (read-only) so per-row
characteristics match — per-language vocabulary resampling with the
original length/lang/source distributions, the original exact-dup
(~0.16%) and near-dup (~0.5%) injection rates, and cluster-structured
embeddings sampled around the sf0.1 label centroids. Deterministic
(numpy seed 42). Other tables symlink to sf0.1 (the six heavy queries
read only documents/embeddings; Engine.tables eagerly opens all).

Run from the repo root: python3 tools/gen_scaling_data.py
Writes target/scaling/sf0.5 and target/scaling/sf1.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os
import duckdb
from collections import defaultdict

SRC = '/root/testdata/sf0.1'

con = duckdb.connect()
docs = con.execute(
    f"select * from '{SRC}/documents.parquet'").fetchnumpy()
emb = pq.read_table(f'{SRC}/embeddings.parquet')

texts = [str(t) for t in docs['text']]
langs = list(docs['lang'])
sources = list(docs['source'])
vocab = defaultdict(list)
for t, l in zip(texts, langs):
    vocab[str(l)].extend(t.split())
vocab = {l: np.array(v) for l, v in vocab.items()}
lens = np.array([len(t.split()) for t in texts])


def gen_docs(sf, n, seed):
    rng = np.random.default_rng(seed)
    out_t, out_l, out_s = [], [], []
    li = rng.integers(0, len(langs), n)
    for i in range(n):
        l = str(langs[li[i]])
        L = int(lens[rng.integers(0, len(lens))])
        words = vocab[l][rng.integers(0, len(vocab[l]), L)]
        out_t.append(' '.join(words))
        out_l.append(l)
        out_s.append(str(sources[rng.integers(0, len(sources))]))
    n_exact = max(1, int(n * 0.0016))
    n_near = max(1, int(n * 0.005))
    for _ in range(n_exact):
        src = int(rng.integers(0, n))
        dst = int(rng.integers(0, n))
        out_t[dst] = out_t[src]
        out_l[dst] = out_l[src]
    for _ in range(n_near):
        src = int(rng.integers(0, n))
        dst = int(rng.integers(0, n))
        w = out_t[src].split()
        if len(w) > 4:
            k = int(rng.integers(0, len(w)))
            w[k] = str(vocab[out_l[src]][
                rng.integers(0, len(vocab[out_l[src]]))])
        out_t[dst] = ' '.join(w)
        out_l[dst] = out_l[src]
    tbl = pa.table({
        'doc_id': pa.array(np.arange(n), pa.int64()),
        'text': pa.array(out_t),
        'lang': pa.array(out_l),
        'source': pa.array(out_s),
        'n_chars': pa.array([len(t) for t in out_t], pa.int64())})
    d = f'target/scaling/sf{sf}'
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, f'{d}/documents.parquet')
    return d


def gen_emb(sf, n, seed):
    rng = np.random.default_rng(seed + 7)
    vecs = np.stack([np.array(v)
                     for v in emb.column('embedding').to_pylist()])
    labels = np.array(emb.column('label').to_pylist())
    cents = {l: vecs[labels == l].mean(axis=0)
             for l in np.unique(labels)}
    spread = {l: vecs[labels == l].std(axis=0).mean()
              for l in np.unique(labels)}
    ls = rng.choice(np.unique(labels), n)
    out = np.stack([cents[l] + rng.normal(0, spread[l], vecs.shape[1])
                    for l in ls]).astype(np.float32)
    tbl = pa.table({
        'vec_id': pa.array(np.arange(n), pa.int64()),
        'embedding': pa.array(list(out), pa.list_(pa.float32())),
        'label': pa.array(ls.astype(np.int32), pa.int32())})
    pq.write_table(tbl, f'target/scaling/sf{sf}/embeddings.parquet')


if __name__ == '__main__':
    for sf, nd, ne in [('0.5', 25000, 10000), ('1', 50000, 20000)]:
        d = gen_docs(sf, nd, 42)
        gen_emb(sf, ne, 42)
        for t in ['region', 'nation', 'customer', 'supplier', 'part',
                  'orders', 'lineitem', 'events']:
            dst = f'{d}/{t}.parquet'
            if not os.path.exists(dst):
                os.symlink(f'{SRC}/{t}.parquet', dst)
        print(sf, con.execute(
            f"select count(*), count(distinct md5(text)) "
            f"from '{d}/documents.parquet'").fetchone())
