#!/usr/bin/env python
"""Generate a scale-factor ANALOG of the driver testdata for optimization
measurement only (guide §1: measure at the scale the driver measures).

The driver's round-end bench may run at sf1.0 (BENCH_r05.json: sf="1.0"),
but /root/testdata only ships sf<=0.1 and is read-only.  This tool builds
/root/sfbig/sf<K> with the same schemas, the same per-table scaling rules
observed across sf0.001/0.01/0.1 (relational tables ~ sf, documents
max(500, 50k*sf), embeddings max(500, 20k*sf), events 1M*sf with 15k*sf
users), the same single-file parquet layout (pyarrow default row groups,
snappy), and the same value distributions:

- relational tables (lineitem/orders/customer/part/supplier/events) are
  TILED k x from sf0.1 with per-replica key offsets, which preserves every
  per-key multiplicity and join selectivity exactly;
- documents are regenerated i.i.d. from the observed generator shape
  (uniform 10..100 words over the 30-word vocab, 5 langs at the observed
  mix, 20 sources, ~0.3% planted exact-dup rows marked with the 'dup'
  token, exactly like the originals);
- embeddings are fresh unit-normalized N(0,1) dim-64 vectors, labels
  uniform 0..9.

NOT used by bench.py or any query: measurement scaffolding only.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def tile_table(name: str, k: int, key_cols: dict[str, int], out_dir: str,
               id_col: str | None = None) -> None:
    """Write k replicas of sf0.1/<name>, offsetting each key column by
    replica * (max+1) so joins stay replica-internal."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    cols = {c: t.column(c).to_numpy(zero_copy_only=False) for c in t.column_names}
    parts = []
    for r in range(k):
        rep = {}
        for c, arr in cols.items():
            if c in key_cols:
                rep[c] = arr + r * key_cols[c]
            else:
                rep[c] = arr
        parts.append(pa.table(rep, schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def gen_documents(n: int, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    nw = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=nw[i])
        texts.append(" ".join(words))
    # planted exact dups at the observed ~0.32% row rate, tagged with 'dup'
    n_dup_groups = max(1, n // 625)
    for g in range(n_dup_groups):
        i = int(rng.integers(0, n))
        j = int(rng.integers(0, n))
        texts[i] = texts[i] + " dup"
        texts[j] = texts[i]
    tab = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    })
    pq.write_table(tab, f"{out_dir}/documents.parquet")
    print(f"documents: {n} rows")


def gen_embeddings(n: int, out_dir: str, dim: int = 64, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tab, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {n} rows")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/root/sfbig/sf{k / 10:.1f}"
    os.makedirs(out_dir, exist_ok=True)
    # small dimension tables: copy as-is (fixed size across sf)
    for name in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
    tile_table("customer", k, {"c_custkey": 15000}, out_dir)
    tile_table("supplier", k, {"s_suppkey": 1000}, out_dir)
    tile_table("part", k, {"p_partkey": 20000}, out_dir)
    tile_table("orders", k, {"o_orderkey": 150000, "o_custkey": 15000}, out_dir)
    tile_table(
        "lineitem", k,
        {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
        out_dir,
    )
    tile_table("events", k, {"event_id": 100000, "user_id": 1500}, out_dir)
    gen_documents(5000 * k, out_dir)
    gen_embeddings(2000 * k, out_dir)
    open(f"{out_dir}/_DONE", "w").close()
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
