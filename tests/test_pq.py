"""Product quantization ANN: codebook training, m-byte encoding, ADC
search — recall and distortion contracts vs the exact brute-force path
(the same exact-twin discipline as the LSH/IVF ANN tests)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.operators.knn import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, dim=64, m=8, ks=64)


def test_pq_codes_are_m_bytes(emb, books):
    codes = pq_encode(emb, books).toPandas()
    assert len(codes) == emb.count()
    assert {len(c) for c in codes["code"]} == {8}  # 8 bytes vs 256-byte float32


def test_pq_recall_vs_bruteforce(spark, emb, books):
    """ADC top-5 must retain most of the exact top-5 — PQ trades a bounded
    amount of ranking fidelity for a 32x smaller corpus representation."""
    probes = emb.where(F.col("vec_id") < 8)
    codes = pq_encode(emb, books)
    exact = brute_force_topk(emb, probes, "vec_id", "embedding", k=5).select(
        "probe_id", "neighbor_id"
    )
    n_probes = probes.count()
    # ADC-only: the shortlist ranking is approximate — a loose floor
    adc_only = pq_topk(codes, probes, books, k=5).select("probe_id", "neighbor_id")
    adc_recall = adc_only.intersect(exact).count() / (5 * n_probes)
    assert adc_recall >= 0.25, adc_recall
    # ADC shortlist + exact re-rank (IVFADC+R): recall must be high
    rr = pq_topk(
        codes, probes, books, k=5, rerank_with=emb, rerank_shortlist=50
    ).select("probe_id", "neighbor_id")
    rr_recall = rr.intersect(exact).count() / (5 * n_probes)
    assert rr_recall >= 0.8, rr_recall
    assert rr_recall >= adc_recall


def test_pq_adc_tracks_true_cosine(spark, emb, books):
    """Per returned neighbor, the ADC score approximates the true cosine:
    mean absolute error bounded by subspace quantization distortion."""
    probes = emb.where(F.col("vec_id") < 4)
    codes = pq_encode(emb, books)
    approx = pq_topk(codes, probes, books, k=5)
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], np.float32)
        for r in emb.where(F.col("vec_id") < 2000).collect()
    }

    def cos(a, b):
        a = a / max(np.linalg.norm(a), 1e-9)
        b = b / max(np.linalg.norm(b), 1e-9)
        return float(a @ b)

    rows = approx.collect()
    assert rows
    errs = [
        abs(r["adc_cosine"] - cos(vecs[int(r["probe_id"])], vecs[int(r["neighbor_id"])]))
        for r in rows
        if int(r["neighbor_id"]) in vecs
    ]
    assert errs and float(np.mean(errs)) < 0.15, np.mean(errs)


def test_pq_validations(emb, books):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, dim=64, m=7)
    with pytest.raises(ValueError, match="uint8"):
        pq_encode(emb, np.zeros((4, 300, 16), np.float32))


def test_pq_topk_bounds_probe_side(emb, books):
    """The probes-broadcast-small contract is enforced: an oversized probe
    set raises instead of materializing on the driver (round-3 review
    item — the collect is limit-bounded)."""
    codes = pq_encode(emb, books)
    with pytest.raises(ValueError, match="max_probes"):
        pq_topk(codes, emb, books, k=3, max_probes=5)


def test_train_sample_is_one_bounded_scan(emb):
    """Training draws its sample in ONE pass: orderBy(hash)+limit compiles
    to TakeOrderedAndProject (per-task top-k, no count() pre-pass, no
    global sort exchange)."""
    from datasketches_cpp_spark.operators.knn import _bounded_vec_sample

    plan = (
        emb.select("embedding")
        .orderBy(F.xxhash64(F.col("embedding"), F.lit(9001)))
        .limit(100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # determinism: same draw regardless of layout
    a = _bounded_vec_sample(emb, "embedding", 50, seed=9001)
    b = _bounded_vec_sample(emb.repartition(17), "embedding", 50, seed=9001)
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (operators/knn.semantic_dedup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_canonical_min_matches_bruteforce(spark, emb):
    """canonical_min over label buckets == per-vector min smaller-id
    within-bucket neighbor at cosine >= tau, re-derived here with the exact
    self-join baseline."""
    from datasketches_cpp_spark.operators.knn import (
        cosine_near_dup_pairs,
        semantic_dedup,
    )

    tau = 0.4
    out = {
        r.id: (r.rep_id, r.is_kept)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", bucket_col="label", threshold=tau
        ).collect()
    }
    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    pairs = [
        (r.a, r.b)
        for r in cosine_near_dup_pairs(emb, "vec_id", "embedding", tau).collect()
        if lab[r.a] == lab[r.b]
    ]
    assert len(out) == len(lab)
    expect_rep = {v: v for v in lab}
    for a, b in pairs:
        expect_rep[b] = min(expect_rep[b], a)
    for v, (rep, kept) in out.items():
        assert rep == expect_rep[v], v
        assert kept == (rep == v)


def test_semantic_dedup_cc_collapses_chains(spark, emb):
    """policy='cc' reps are transitive-closure min ids: every canonical_min
    dup is also a cc dup, and cc reps are component minima (<= depth-1 reps)."""
    from datasketches_cpp_spark.operators.knn import semantic_dedup

    cm = {
        r.id: r.rep_id
        for r in semantic_dedup(
            emb, "vec_id", "embedding", bucket_col="label", threshold=0.4
        ).collect()
    }
    cc = {
        r.id: r.rep_id
        for r in semantic_dedup(
            emb, "vec_id", "embedding", bucket_col="label", threshold=0.4, policy="cc"
        ).collect()
    }
    assert set(cm) == set(cc)
    for v in cm:
        assert cc[v] <= cm[v]
        if cm[v] != v:
            assert cc[v] != v


def test_semantic_dedup_ivf_buckets(spark, emb):
    """bucket_col=None trains k-means-lite centroids and buckets by nearest
    centroid (the SemDeDup recipe): every vector gets exactly one row, reps
    stay within the vector's bucket, and the keep-set only shrinks as the
    threshold drops."""
    from datasketches_cpp_spark.operators.knn import semantic_dedup

    n = emb.count()
    strict = semantic_dedup(emb, threshold=0.9, n_centroids=8).collect()
    loose = semantic_dedup(emb, threshold=0.3, n_centroids=8).collect()
    assert len(strict) == n and len(loose) == n
    bucket_of = {r.id: r.bucket for r in loose}
    for r in loose:
        if not r.is_kept:
            assert bucket_of[r.rep_id] == r.bucket
    assert sum(r.is_kept for r in loose) <= sum(r.is_kept for r in strict)


def test_semantic_dedup_bad_policy(emb):
    from datasketches_cpp_spark.operators.knn import semantic_dedup

    with pytest.raises(ValueError):
        semantic_dedup(emb, bucket_col="label", policy="nope").collect()


def test_semantic_dedup_one_bucket_adversarial(spark, emb):
    """Adversarial skew: EVERY vector lands in one bucket (constant
    bucket_col) and chunk is tiny, so the salted-full machinery must carry
    the whole pairwise stage. Output must equal the brute-force
    canonical_min over ALL pairs, and the hot path must actually engage
    (the candidate plan is the chunk-pair self-join, not one giant
    explode task)."""
    from datasketches_cpp_spark.operators.knn import (
        cosine_near_dup_pairs,
        semantic_dedup,
    )

    tau = 0.4
    one = emb.withColumn("onebucket", F.lit(0))
    out = {
        r.id: (r.rep_id, r.is_kept)
        for r in semantic_dedup(
            one, "vec_id", "embedding", bucket_col="onebucket",
            threshold=tau, chunk=16,
        ).collect()
    }
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    expect_rep = {v: v for v in ids}
    for r in cosine_near_dup_pairs(emb, "vec_id", "embedding", tau).collect():
        expect_rep[r.b] = min(expect_rep[r.b], r.a)
    assert len(out) == len(ids)
    for v, (rep, kept) in out.items():
        assert rep == expect_rep[v], v
        assert kept == (rep == v)


def test_semantic_dedup_hot_bucket_chunk_rows_bounded(spark, emb):
    """The scale contract behind the one-bucket case: a bucket of s ids at
    chunk c becomes ceil(s/c)*(ceil(s/c)+1)/2 chunk-pair rows, each
    expanding at most c*c candidate structs — NO task ever sees the
    whole bucket's C(s,2). Verified on the internal salted frame."""
    from datasketches_cpp_spark.operators.lsh import pairs_from_bands

    s = emb.count()
    c = 16
    bands = emb.select(
        F.lit(0).alias("band_idx"), F.lit(0).alias("band_hash"),
        F.col("vec_id").alias("id"),
    )
    pairs = pairs_from_bands(bands, max_pairs_group=c, hot_policy="salted_full")
    assert pairs.count() == s * (s - 1) // 2
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the salt IS a join on the band key — a plain single-group explode
    # (unbounded task) would have no join at all
    assert "Join" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_adaptive_centroids(spark, emb):
    """n_centroids=None derives k from the corpus count and a target
    bucket mass: k = ceil(n / target_bucket). Contract: one row per
    vector, reps within-bucket, and small target_bucket => more buckets
    than the fixed-k default would give."""
    from datasketches_cpp_spark.operators.knn import semantic_dedup

    n = emb.count()
    out = semantic_dedup(emb, threshold=0.3, target_bucket=32).collect()
    assert len(out) == n
    n_buckets = len({r.bucket for r in out})
    assert n_buckets > 1
    # k was derived as ceil(n/32); buckets actually used can be fewer
    # (empty lists) but must be bounded by it
    assert n_buckets <= -(-n // 32)
    bucket_of = {r.id: r.bucket for r in out}
    for r in out:
        if not r.is_kept:
            assert bucket_of[r.rep_id] == r.bucket


def test_blocked_centroid_search_matches_direct():
    """Above _CENT_BLOCK centroids the argmax/top-n run block-wise with
    a running best (memory O(rows × block) instead of rows × k — the
    52 GB regime at 200k samples × 65536 adaptive centroids). The
    blocked search must agree with the monolithic matmul: identical
    argmax choices up to BLAS last-ulp ties, and every chosen index
    achieving the row's max similarity."""
    from datasketches_cpp_spark.operators.knn import (
        _blocked_argmax, _blocked_topn,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, 12)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cent = rng.normal(size=(37, 12)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)

    sims = x @ cent.T
    got = _blocked_argmax(x, cent, block=8)
    rows = np.arange(len(x))
    assert np.allclose(sims[rows, got], sims.max(axis=1), atol=1e-6)
    # random continuous sims: no ties, so the choice is exact
    assert np.array_equal(got, sims.argmax(axis=1))

    top = _blocked_topn(x, cent, 3, block=8)
    want = np.argsort(-sims, axis=1)[:, :3]
    assert np.array_equal(top, want)
    # degenerate block bigger than k = single pass = direct
    assert np.array_equal(_blocked_argmax(x, cent, block=512), got)


def test_lloyd_big_k_branch_matches_small_k(monkeypatch):
    """Force the big-k Lloyd branch (blocked argmax + sort-grouped mean
    update) by shrinking the block threshold: centroids must match the
    monolithic branch to float tolerance on the same sample."""
    import datasketches_cpp_spark.operators.knn as knn

    rng = np.random.default_rng(11)
    data = rng.normal(size=(300, 8)).astype(np.float32)

    class FakeDF:  # _bounded_vec_sample is monkeypatched around it
        pass

    monkeypatch.setattr(
        knn, "_bounded_vec_sample", lambda df, c, s, seed: data.copy()
    )
    small = knn.ivf_train_centroids(FakeDF(), n_centroids=24, seed=3)
    monkeypatch.setattr(knn, "_CENT_BLOCK", 7)
    big = knn.ivf_train_centroids(FakeDF(), n_centroids=24, seed=3)
    assert small.shape == big.shape == (24, 8)
    assert np.allclose(small, big, atol=1e-5)
