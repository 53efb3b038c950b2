#!/usr/bin/env python
"""Generate a scaled profiling dataset (default ~sf1.0) from the committed
sf0.1 tables, for OPTIMIZATION-round measurements only (guide §1: the
driver's round-end bench escalates to sf1.0, which is not shipped under
/root/testdata, so scaling work must be measured on same-shaped data).

NOT used by bench.py or any query; never reads results back into queries.

Shape matched to the driver generator as measured on sf0.1:
  * star-schema tables tiled k× with key-domain offsets (distinct-key
    counts, join fan-outs and row counts all scale linearly);
  * documents synthesized fresh (word-salad over the measured 31-word
    vocabulary, uniform 10-100 tokens, ~5% planted containment needles
    that are contiguous token slices of a host doc, ~0.3% exact dups) —
    tiling text 10x verbatim would distort the dedup workload;
  * embeddings sampled per-label from the sf0.1 vectors + small noise.

Usage: python scripts/gen_scaled_sf.py [--mult 10] [--out /root/sfscaled/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def tile(tbl: pa.Table, mult: int, offsets: dict[str, int]) -> pa.Table:
    import pandas as pd

    pdf = tbl.to_pandas()
    parts = []
    for i in range(mult):
        c = pdf.copy()
        for col, stride in offsets.items():
            c[col] = c[col] + i * stride
        parts.append(c)
    out = pd.concat(parts, ignore_index=True)
    return pa.Table.from_pandas(out, schema=pa.schema(
        [tbl.schema.field(j) for j in range(len(tbl.schema))]), preserve_index=False)


def gen_documents(n: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(
        "spark window merge table column vector stream value batch part line order "
        "small sort fast scan a hash slow group agg filter query big key row data "
        "join shuffle cache index".split()
    )
    assert len(vocab) == 31
    n_tok = rng.integers(10, 101, n)
    texts: list[str] = [""] * n
    toks: list[np.ndarray] = [None] * n  # type: ignore[list-item]
    for i in range(n):
        t = vocab[rng.integers(0, 31, n_tok[i])]
        toks[i] = t
    # ~5% containment needles: replace doc i's tokens with a contiguous
    # slice of an earlier (longer) host doc
    n_needle = int(0.05 * n)
    needle_idx = rng.choice(np.arange(1, n), n_needle, replace=False)
    for i in needle_idx:
        h = rng.integers(0, i)
        ht = toks[h]
        if len(ht) < 12:
            continue
        ln = rng.integers(8, max(9, len(ht) - 1))
        ln = min(ln, len(ht) - 1)
        st = rng.integers(0, len(ht) - ln + 1)
        toks[i] = ht[st : st + ln]
    # ~0.3% exact dups
    n_dup = max(1, int(0.0032 * n) // 2)
    dup_a = rng.choice(np.arange(0, n - 1), n_dup, replace=False)
    for a in dup_a:
        toks[a + 1] = toks[a]
    for i in range(n):
        texts[i] = " ".join(toks[i])
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang = langs[rng.choice(5, n, p=[0.41, 0.15, 0.15, 0.15, 0.14])]
    source = np.array([f"src{i % 20}" for i in range(n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array(np.array([len(s) for s in texts]), pa.int64()),
        }
    )


def gen_embeddings(mult: int, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    vecs = np.stack(base["embedding"].to_numpy())
    labels = base["label"].to_numpy()
    n0 = len(base)
    n = n0 * mult
    src_idx = rng.integers(0, n0, n)
    noise = rng.normal(0, 0.02, (n, vecs.shape[1])).astype(np.float32)
    out = vecs[src_idx] + noise
    # match source norm distribution
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    tgt = np.linalg.norm(vecs[src_idx], axis=1, keepdims=True)
    out = out / np.maximum(norms, 1e-9) * tgt
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(out.astype(np.float32))),
            "label": pa.array(labels[src_idx].astype(np.int32)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/sfscaled/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    m = args.mult

    def rd(t: str) -> pa.Table:
        return pq.read_table(f"{SRC}/{t}.parquet")

    def wr(t: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, f"{args.out}/{t}.parquet")
        print(t, tbl.num_rows)

    wr("region", rd("region"))
    wr("nation", rd("nation"))
    wr("supplier", tile(rd("supplier"), m, {"s_suppkey": 1000}))
    wr("part", tile(rd("part"), m, {"p_partkey": 20000}))
    wr("customer", tile(rd("customer"), m, {"c_custkey": 15000}))
    ok_stride = 600000  # > max l_orderkey/o_orderkey at sf0.1
    wr("orders", tile(rd("orders"), m, {"o_orderkey": ok_stride, "o_custkey": 15000}))
    wr(
        "lineitem",
        tile(
            rd("lineitem"),
            m,
            {"l_orderkey": ok_stride, "l_partkey": 20000, "l_suppkey": 1000},
        ),
    )
    wr("events", tile(rd("events"), m, {"event_id": 100000}))
    wr("documents", gen_documents(5000 * m))
    wr("embeddings", gen_embeddings(m))


if __name__ == "__main__":
    main()
