"""End-to-end dedup slice tests (SURVEY.md §7 step 3):

* connected components vs a union-find oracle on random + adversarial graphs
* planted exact dups → recall 1.0 (the reference's exact-mode discipline)
* full Spark pipeline vs the single-node oracle at identical SigConfig —
  the dup-pair-recall ≥ 0.99 BASELINE gate (expected: exact match)
"""

import random

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.operators.cc import assign_clusters, connected_components
from datasketches_cpp_spark.operators.dedup import cluster_stats, dedup, duplicate_rate
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.oracle.pydedup import (
    UnionFind,
    dup_pair_recall,
    oracle_dedup,
)

CFG = SigConfig(num_perm=64, bands=16, kmv_k=128, shingle_w=2, jaccard_threshold=0.7)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _uf_assign(n, edges):
    uf = UnionFind()
    for i in range(n):
        uf.find(i)
    for a, b in edges:
        uf.union(a, b)
    return {i: uf.find(i) for i in range(n)}


@pytest.mark.parametrize("n,m,seed", [(50, 40, 0), (200, 150, 1), (300, 600, 2)])
def test_cc_matches_union_find_random(spark, n, m, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    ids = spark.range(n).select(F.col("id"))
    got = {r["id"]: r["cluster_id"] for r in assign_clusters(ids, edf).collect()}
    want = _uf_assign(n, edges)
    assert got == want


def test_cc_long_chain(spark):
    """Adversarial long chain (FIXTURES.md F2) — label propagation would
    need O(n) rounds; large/small-star must converge in O(log n)."""
    n = 512
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    comp = connected_components(edf, max_iter=15)  # log2(512)=9 ≪ 15
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


@pytest.mark.parametrize("n,m,seed", [(200, 150, 1), (300, 600, 2)])
def test_cc_distributed_rounds_match_driver_finish(spark, n, m, seed):
    """driver_finish_edges=0 forces the pure distributed star-rounds path;
    the default threshold takes the driver min-label path. Both must
    produce identical assignments (the regime switch may never change an
    answer)."""
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    dist = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edf, driver_finish_edges=0).collect()
    }
    drv = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edf).collect()
    }
    assert dist == drv
    want = _uf_assign(n, edges)
    touched = {x for e in edges for x in e}
    assert dict(drv) == {i: want[i] for i in touched}


def test_cc_long_chain_distributed(spark):
    """The adversarial chain through the distributed rounds path (the
    default-threshold test above covers the driver path)."""
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    comp = connected_components(edf, max_iter=15, driver_finish_edges=0)
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


def test_cc_string_ids(spark):
    edges = [("imgB", "imgA"), ("imgC", "imgB"), ("imgX", "imgY")]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    ids = spark.createDataFrame(
        pd.DataFrame({"id": ["imgA", "imgB", "imgC", "imgX", "imgY", "imgZ"]})
    )
    got = {r["id"]: r["cluster_id"] for r in assign_clusters(ids, edf).collect()}
    assert got == {
        "imgA": "imgA", "imgB": "imgA", "imgC": "imgA",
        "imgX": "imgX", "imgY": "imgX", "imgZ": "imgZ",
    }


def test_cc_empty_edges(spark):
    edf = spark.createDataFrame(pd.DataFrame({"a": [], "b": []}), "a long, b long")
    ids = spark.range(5)
    got = {r["id"]: r["cluster_id"] for r in assign_clusters(ids, edf).collect()}
    assert got == {i: i for i in range(5)}


# ---------------------------------------------------------------------------
# planted-duplicate corpora
# ---------------------------------------------------------------------------


def _make_corpus(seed=7, n_base=60):
    """Deterministic corpus: unique docs + exact dups + near dups (one token
    changed) + a transitive chain — the FIXTURES.md F2 mix in miniature."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(500)]
    docs = {}
    truth = {}  # id -> group representative
    gid = 0
    for i in range(n_base):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(20, 60)))
        docs[f"d{gid:04d}_0"] = text
        truth[f"d{gid:04d}_0"] = gid
        if i % 5 == 0:  # exact duplicate
            docs[f"d{gid:04d}_1"] = text
            truth[f"d{gid:04d}_1"] = gid
        if i % 7 == 0:  # near duplicate: change one token
            toks = text.split()
            toks[len(toks) // 2] = "CHANGED"
            docs[f"d{gid:04d}_2"] = " ".join(toks)
            truth[f"d{gid:04d}_2"] = gid
        gid += 1
    return docs, truth


def test_pipeline_exact_dups_recall_1(spark):
    """Every exact duplicate pair must be found (J = 1 ≥ any threshold,
    identical band hashes ⇒ guaranteed candidates)."""
    docs, truth = _make_corpus()
    pdf = pd.DataFrame({"id": list(docs), "text": list(docs.values())})
    df = spark.createDataFrame(pdf).repartition(4)
    assignments, verified, _ = dedup(df, "id", "text", CFG)
    got = {r["id"]: r["cluster_id"] for r in assignments.collect()}
    # exact dup pairs (same text) must land in the same cluster
    by_text = {}
    for i, t in docs.items():
        by_text.setdefault(t, []).append(i)
    for members in by_text.values():
        roots = {got[m] for m in members}
        assert len(roots) == 1, f"exact dups split: {members}"


def test_pipeline_matches_oracle(spark):
    """The BASELINE gate: Spark assignments vs single-node oracle at the
    identical SigConfig — dup-pair recall ≥ 0.99 (expected exactly 1.0 and
    identical assignments, since both sides share kernels and rules)."""
    docs, _ = _make_corpus(seed=11, n_base=80)
    ids, texts = list(docs), list(docs.values())
    oracle_assign, oracle_pairs, _ = oracle_dedup(ids, texts, CFG)

    pdf = pd.DataFrame({"id": ids, "text": texts})
    df = spark.createDataFrame(pdf).repartition(5)
    assignments, verified, _ = dedup(df, "id", "text", CFG)
    got = {r["id"]: r["cluster_id"] for r in assignments.collect()}

    recall = dup_pair_recall(oracle_assign, got)
    assert recall >= 0.99
    # and in fact identical cluster assignments (min-id labels both sides)
    assert got == oracle_assign


def test_pipeline_partitioning_invariance(spark):
    """Same corpus at different partition counts → identical assignments
    (the property that makes the N vs 4N scaling run return identical
    results — BASELINE.md scaling protocol)."""
    docs, _ = _make_corpus(seed=3, n_base=40)
    pdf = pd.DataFrame({"id": list(docs), "text": list(docs.values())})
    results = []
    for parts in (1, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        assignments, _, _ = dedup(df, "id", "text", CFG)
        results.append({r["id"]: r["cluster_id"] for r in assignments.collect()})
    assert results[0] == results[1]


def test_hot_band_capping_preserves_clustering(spark):
    """Adversarial skew fixture (FIXTURES.md F2): one text duplicated 300×
    — a single hot band group. Capping must keep them one cluster while
    emitting O(s) not O(s²) pairs."""
    base = "the same boilerplate caption repeated everywhere in the corpus"
    docs = {f"hot{i:04d}": base for i in range(300)}
    docs.update({f"uniq{i:04d}": f"unique text number {i} with filler {i*7}" for i in range(50)})
    pdf = pd.DataFrame({"id": list(docs), "text": list(docs.values())})
    df = spark.createDataFrame(pdf).repartition(6)
    assignments, verified, _ = dedup(df, "id", "text", CFG, max_pairs_group=32)
    got = {r["id"]: r["cluster_id"] for r in assignments.collect()}
    hot_roots = {got[f"hot{i:04d}"] for i in range(300)}
    assert hot_roots == {"hot0000"}
    n_pairs = verified.count()
    assert n_pairs < 300 * 299 / 2 / 10  # far below quadratic


def test_cluster_stats_and_duprate(spark):
    docs = {"a": "x y z w", "b": "x y z w", "c": "totally different things here"}
    pdf = pd.DataFrame({"id": list(docs), "text": list(docs.values())})
    assignments, _, _ = dedup(spark.createDataFrame(pdf), "id", "text", CFG)
    stats = {r["cluster_size"]: r["num_clusters"] for r in cluster_stats(assignments).collect()}
    assert stats == {1: 1, 2: 1}
    dr = duplicate_rate(assignments).collect()[0]
    assert dr["total_docs"] == 3 and dr["duplicate_docs"] == 1


def test_salted_full_pairs_equals_bruteforce(spark):
    """SURVEY §2B S5 salted repartition: hot_policy="salted_full" must emit
    EXACTLY the all-pairs set (full semantics under skew), with task memory
    bounded by chunk² rather than group-size²."""
    from datasketches_cpp_spark.operators.lsh import pairs_from_bands

    rows = []
    # band 0: one hot group of 37 ids (cap 8 → 5 chunks), plus a normal pair
    rows += [(0, 111, f"h{i:03d}") for i in range(37)]
    rows += [(0, 222, "n1"), (0, 222, "n2")]
    # band 1: hot group of 17 sharing some ids, and a singleton (pruned)
    rows += [(1, 333, f"h{i:03d}") for i in range(10, 27)]
    rows += [(1, 444, "alone")]
    bands = spark.createDataFrame(
        pd.DataFrame(rows, columns=["band_idx", "band_hash", "id"])
    ).repartition(5)

    def brute(rows):
        from collections import defaultdict
        import itertools
        g = defaultdict(set)
        for bi, bh, i in rows:
            g[(bi, bh)].add(i)
        out = set()
        for ids in g.values():
            out |= {tuple(sorted(p)) for p in itertools.combinations(ids, 2)}
        return out

    expect = brute(rows)
    got = {
        (r["a"], r["b"])
        for r in pairs_from_bands(bands, max_pairs_group=8, hot_policy="salted_full").collect()
    }
    assert got == expect
    # a < b invariant
    assert all(a < b for a, b in got)
    # chain_hub on the same input is strictly a subset (capped) and smaller
    capped = {
        (r["a"], r["b"])
        for r in pairs_from_bands(bands, max_pairs_group=8, hot_policy="chain_hub").collect()
    }
    assert capped < got


def test_salted_full_pairs_all_jvm(spark):
    """The salted path must stay whole-stage-codegen JVM: no Python eval
    nodes in the physical plan."""
    from datasketches_cpp_spark.operators.lsh import pairs_from_bands

    bands = spark.createDataFrame(
        pd.DataFrame({"band_idx": [0] * 20, "band_hash": [7] * 20, "id": [f"d{i}" for i in range(20)]})
    )
    plan = pairs_from_bands(bands, max_pairs_group=4, hot_policy="salted_full")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_salted_full_property_random_bands(spark):
    """Property check (reference test discipline): on random band tables —
    mixed group sizes straddling the chunk cap, shared ids across bands —
    salted_full emits EXACTLY the brute-force pair set."""
    import itertools
    from collections import defaultdict

    from datasketches_cpp_spark.operators.lsh import pairs_from_bands

    rng = np.random.default_rng(0)
    for trial in range(4):
        rows = []
        n_groups = int(rng.integers(2, 6))
        for g in range(n_groups):
            size = int(rng.integers(1, 30))
            members = rng.choice(60, size=size, replace=False)
            rows += [(int(g % 3), int(1000 + g), f"v{m:02d}") for m in members]
        bands = spark.createDataFrame(
            pd.DataFrame(rows, columns=["band_idx", "band_hash", "id"])
        ).repartition(int(rng.integers(1, 7)))
        cap = int(rng.integers(2, 12))
        grouped = defaultdict(set)
        for bi, bh, i in rows:
            grouped[(bi, bh)].add(i)
        expect = set()
        for ids in grouped.values():
            expect |= {tuple(sorted(p)) for p in itertools.combinations(ids, 2)}
        got = {
            (r["a"], r["b"])
            for r in pairs_from_bands(bands, max_pairs_group=cap, hot_policy="salted_full").collect()
        }
        assert got == expect, (trial, cap)


def test_select_representatives_keeps_best(spark):
    """Keep-best curation: highest score wins its cluster, ties break to
    the smallest id, singletons keep themselves."""
    from datasketches_cpp_spark.operators.dedup import select_representatives

    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 30.0), (4, 1.0), (5, 2.0), (6, 0.0)],
        "id long, score double",
    )
    out = {r.id: (r.rep_id, r.is_kept) for r in
           select_representatives(assignments, scores, "id", "score").collect()}
    assert out == {
        1: (2, False), 2: (2, True), 3: (2, False),   # tie 2 vs 3 -> min id 2
        4: (5, False), 5: (5, True),                   # higher score wins
        6: (6, True),                                  # singleton
    }


def test_caption_conflicts_canonicalization_and_plan(spark):
    """Decorated same-captions don't conflict; different captions do;
    one join + one groupBy, no Python in the plan."""
    from datasketches_cpp_spark.operators.dedup import caption_conflicts

    assignments = spark.createDataFrame(
        [("a1", "c0"), ("a2", "c0"), ("b1", "c1"), ("b2", "c1"), ("s", "s")],
        "id string, cluster_id string",
    )
    images = spark.createDataFrame(
        [
            ("a1", "Hello World"),
            ("a2", "  hello   WORLD!! "),
            ("b1", "a cat"),
            ("b2", "a dog"),
            ("s", "alone"),
        ],
        "image_id string, caption string",
    )
    out = caption_conflicts(assignments, images)
    got = {r.cluster_id: (r.n_members, r.n_captions, r.caption_conflict)
           for r in out.collect()}
    assert got == {
        "c0": (2, 1, False),
        "c1": (2, 2, True),
        "s": (1, 1, False),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_select_representatives_keeps_unscored_members(spark):
    """LEFT-join semantics: a cluster member the scorer skipped still
    appears (unscored members lose to any scored one; an all-unscored
    cluster keeps its smallest id)."""
    from datasketches_cpp_spark.operators.dedup import select_representatives

    asg = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")],
        "id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("a", 1.0), ("b", 5.0)], "id string, score double"
    )  # c unscored; d/e entirely unscored
    rows = {r["id"]: r for r in select_representatives(asg, scores).collect()}
    assert set(rows) == {"a", "b", "c", "d", "e"}
    assert rows["c"]["rep_id"] == "b" and not rows["c"]["is_kept"]
    assert rows["d"]["rep_id"] == "d" and rows["d"]["is_kept"]
