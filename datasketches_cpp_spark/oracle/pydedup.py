"""Single-node dedup oracle — the parity reference for the Spark pipeline.

Plays the role of the reference's deterministic validation tables
(kll/test/kll_sketch_validation.cpp:25-114) and cross-language golden files
(*_from_java_test.cpp): a small, slow, obviously-correct implementation at a
pinned `SigConfig`, against which the distributed pipeline's cluster
assignments must reach dup-pair recall ≥ 0.99 (BASELINE.json north_rule; in
practice equality, since both sides share the numpy signature kernels and
the banding/capping rules are identical by construction).

Everything here is plain dicts + union-find — no Spark, no parallelism.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..operators.minhash import signature_batch
from ..operators.sigkernel import SigConfig, hamming64


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-id root so cluster labels match the pipeline's min-id convention
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def oracle_candidate_pairs(sig_pdf, cfg: SigConfig, max_pairs_group: int = 256):
    """Same banding + capping semantics as operators/lsh.candidate_pairs,
    written the obvious way (dict of band → member list)."""
    groups: dict[tuple[int, int], list] = defaultdict(list)
    for _, row in sig_pdf.iterrows():
        if row["n_shingles"] <= 0:
            continue
        for band_idx, band_hash in enumerate(row["bands"]):
            groups[(band_idx, int(band_hash))].append(row["id"])
    pairs = set()
    for members in groups.values():
        ids = sorted(set(members))
        s = len(ids)
        if s < 2:
            continue
        if s <= max_pairs_group:
            for i in range(s):
                for j in range(i + 1, s):
                    pairs.add((ids[i], ids[j]))
        else:
            hub = ids[0]
            for i in range(s - 1):
                pairs.add(tuple(sorted((ids[i], ids[i + 1]))))
                pairs.add(tuple(sorted((hub, ids[i + 1]))))
    return sorted(pairs)


def oracle_verify(sig_pdf, pairs, cfg: SigConfig, use_simhash: bool = True):
    """Same OR-fusion decision as operators/verify.verify_pairs."""
    by_id = sig_pdf.set_index("id")
    out = []
    for a, b in pairs:
        ra, rb = by_id.loc[a], by_id.loc[b]
        sa = np.asarray(ra["kmv_sig"], dtype=np.int64).astype(np.uint64)
        sb = np.asarray(rb["kmv_sig"], dtype=np.int64).astype(np.uint64)
        theta = min(
            _dec(int(ra["kmv_theta"])), _dec(int(rb["kmv_theta"]))
        )
        sa = sa[: np.searchsorted(sa, np.uint64(theta))]
        sb = sb[: np.searchsorted(sb, np.uint64(theta))]
        if len(sa) == 0 and len(sb) == 0:
            j = 1.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
        ham = int(
            hamming64(
                np.array([ra["simhash"]], dtype=np.int64).astype(np.uint64),
                np.array([rb["simhash"]], dtype=np.int64).astype(np.uint64),
            )[0]
        )
        passed = j >= cfg.jaccard_threshold or (use_simhash and ham <= cfg.simhash_hamming)
        if passed:
            out.append((a, b, j, ham))
    return out


def _dec(enc: int) -> int:
    return (1 << 63) if enc < 0 else enc


def oracle_cluster(ids, verified_pairs) -> dict:
    uf = UnionFind()
    for i in ids:
        uf.find(i)
    for a, b, *_ in verified_pairs:
        uf.union(a, b)
    return {i: uf.find(i) for i in ids}


def oracle_dedup(
    ids: list,
    contents: list,
    cfg: SigConfig,
    kind: str = "text",
    max_pairs_group: int = 256,
    use_simhash: bool = True,
):
    """End-to-end oracle: (ids, contents) → (assignments dict, verified
    pairs, signature pdf)."""
    sig = signature_batch(ids, contents, cfg, kind)
    pairs = oracle_candidate_pairs(sig, cfg, max_pairs_group)
    verified = oracle_verify(sig, pairs, cfg, use_simhash)
    assign = oracle_cluster(ids, verified)
    return assign, verified, sig


def dup_pairs_from_assignment(assign: dict) -> set:
    """All same-cluster unordered pairs implied by an assignment — the
    recall denominator."""
    clusters = defaultdict(list)
    for i, c in assign.items():
        clusters[c].append(i)
    out = set()
    for members in clusters.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def dup_pair_recall(oracle_assign: dict, got_assign: dict) -> float:
    """Fraction of oracle same-cluster pairs recovered — the BASELINE gate."""
    want = dup_pairs_from_assignment(oracle_assign)
    if not want:
        return 1.0
    got = dup_pairs_from_assignment(got_assign)
    return len(want & got) / len(want)
