"""Single-node oracle for the multi-lane image pipeline — mirrors
operators/imagededup.dedup_images lane by lane with plain dicts/loops, at
the identical SigConfig (golden-assignment parity, FIXTURES.md F4)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..operators.minhash import signature_batch
from ..operators.sigkernel import SigConfig, hamming64
from .pydedup import (
    UnionFind,
    oracle_candidate_pairs,
    oracle_verify,
)


def oracle_phash_pairs(ids, phashes, cfg: SigConfig, max_pairs_group: int = 256):
    from itertools import combinations

    nb, combo = cfg.phash_bands, cfg.phash_combo
    width = 64 // nb
    mask = (1 << width) - 1
    groups = defaultdict(list)
    ph = {i: int(np.uint64(np.int64(p))) for i, p in zip(ids, phashes)}
    combos = list(combinations(range(nb), combo))
    for i in ids:
        sl = [(ph[i] >> (s * width)) & mask for s in range(nb)]
        for b, comb in enumerate(combos):
            key = 0
            for j, c in enumerate(comb):
                key |= sl[c] << (j * width)
            groups[(b, key)].append(i)
    pairs = set()
    for members in groups.values():
        m = sorted(set(members))
        s = len(m)
        if s < 2:
            continue
        if s <= max_pairs_group:
            for x in range(s):
                for y in range(x + 1, s):
                    pairs.add((m[x], m[y]))
        else:
            hub = m[0]
            for x in range(s - 1):
                pairs.add(tuple(sorted((m[x], m[x + 1]))))
                pairs.add(tuple(sorted((hub, m[x + 1]))))
    out = []
    for a, b in sorted(pairs):
        d = int(
            hamming64(
                np.array([ph[a]], dtype=np.uint64), np.array([ph[b]], dtype=np.uint64)
            )[0]
        )
        if d <= cfg.phash_hamming:
            out.append((a, b, d))
    return out


def oracle_substring_pairs(
    ids, texts, cfg: SigConfig, max_posting_list: int = 64, min_tokens: int = 3
):
    """Mirror of operators/substring.substring_pairs: min-shingle inverted
    index with capped posting lists, exact token-level containment check."""
    from ..operators.sigkernel import token_shingle_hashes

    sh, off = token_shingle_hashes(list(texts), cfg.shingle_w, cfg.seed)
    toks = [t.split() for t in texts]
    postings = defaultdict(list)
    minshingle = {}
    for i, rid in enumerate(ids):
        seg = np.unique(sh[off[i] : off[i + 1]])
        if len(seg) == 0 or len(toks[i]) < min_tokens:
            continue
        minshingle[rid] = int(seg[0])
        for v in seg:
            postings[int(v)].append(rid)
    by_id = {rid: toks[i] for i, rid in enumerate(ids)}
    pairs = set()
    for rid, ms in minshingle.items():
        hosts = sorted(postings[ms])[:max_posting_list]
        needle = by_id[rid]
        for h in hosts:
            if h == rid:
                continue
            host = by_id[h]
            if len(needle) >= len(host):
                continue
            m = len(needle)
            if any(host[j : j + m] == needle for j in range(len(host) - m + 1)):
                pairs.add((min(rid, h), max(rid, h)))
    return sorted(pairs)


def oracle_dedup_images(
    images_pdf,
    cfg: SigConfig,
    bytes_cfg: SigConfig,
    max_pairs_group: int = 256,
    byte_stride: int = 4,
    enable_lanes: tuple = ("caption", "bytes", "phash", "substring"),
):
    """→ (assignments dict, edges set) mirroring dedup_images."""
    ids = images_pdf["image_id"].tolist()
    edges = set()

    if "caption" in enable_lanes:
        sig = signature_batch(ids, images_pdf["caption"].tolist(), cfg, "text")
        pairs = oracle_candidate_pairs(sig, cfg, max_pairs_group)
        for a, b, *_ in oracle_verify(sig, pairs, cfg, use_simhash=True):
            edges.add((a, b))

    if "bytes" in enable_lanes:
        sig = signature_batch(
            ids, images_pdf["bytes"].tolist(), bytes_cfg, "binary", byte_stride
        )
        pairs = oracle_candidate_pairs(sig, bytes_cfg, max_pairs_group)
        for a, b, *_ in oracle_verify(sig, pairs, bytes_cfg, use_simhash=False):
            edges.add((a, b))

    if "phash" in enable_lanes:
        for a, b, _ in oracle_phash_pairs(
            ids, images_pdf["phash"].tolist(), cfg, max_pairs_group
        ):
            edges.add((a, b))

    if "substring" in enable_lanes:
        for a, b in oracle_substring_pairs(ids, images_pdf["caption"].tolist(), cfg):
            edges.add((a, b))

    uf = UnionFind()
    for i in ids:
        uf.find(i)
    for a, b in edges:
        uf.union(a, b)
    return {i: uf.find(i) for i in ids}, edges
