"""Similarity search + embedding near-dup over embedding columns
(array<float>).

Paths:
  * brute_force_topk — exact cosine top-k: broadcast the (small) probe set
    against the corpus, JVM-side dot product via F.zip_with + F.aggregate,
    window row_number for the top-k cut. The correctness baseline.
  * lsh_topk — random-hyperplane (SimHash) bucketed ANN: probes only
    compare against corpus rows sharing a hash bucket in ≥1 of several
    hash tables — the 100 TB scale path (candidates shrink by the bucket
    selectivity; recall tunable via tables × bits).
  * cosine_near_dup_pairs / cosine_near_dup_pairs_lsh — all-pairs
    embedding near-duplicate edges (cosine ≥ τ): exact self-join baseline
    vs hyperplane-bucketed candidates + exact verify (the dedup lane for
    embedding-bearing corpora).
  * ivf_train_centroids / ivf_topk — inverted-file ANN: k-means-lite centroids, each
    vector assigned to its nearest centroid partition; probes scan only
    the ``nprobe`` nearest inverted lists. Vectorized numpy matmuls inside
    Arrow batches — the classic billion-scale layout (coarse quantizer +
    list scan).
  * pq_train / pq_encode / pq_topk — product quantization (Jégou et al.
    2011): corpus vectors become m-byte codes (32x smaller at dim=64,
    m=8), queries run as ADC table lookups against the codes. pq_topk
    scans all codes (PQ-flat); compose with ivf_assign to scan only
    nprobe lists (IVFADC) when even the code table is too big to sweep.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


#: probe-set size up to which brute_force_topk collects the probes and
#: scores the corpus in one numpy mapInArrow stage instead of the
#: interpreted JVM higher-order-function path (r6: the lambda-per-element
#: evaluation cost 1.6 s at 20k×5×64 dims where numpy needs ~50 ms).
#: Above the threshold the original crossJoin plan runs unchanged.
BRUTE_FORCE_COLLECT_PROBES = 1024


def _strict_dot(prods: np.ndarray) -> np.ndarray:
    """Row-wise STRICT left-fold sum (np.add.accumulate is sequential by
    definition) — bit-identical to F.aggregate's (acc + v) fold, unlike
    np.sum's pairwise summation, so ranks can never differ from the JVM
    path at FP-tie margins."""
    return np.add.accumulate(prods, axis=1)[:, -1]


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(probe_id, neighbor_id, cosine, rank) — exact top-k by cosine.
    Probes are broadcast (they're the small side by construction); the
    corpus is scanned once, no shuffle until the per-probe top-k window,
    which moves only (probe × corpus-candidates) scored rows.

    With at most BRUTE_FORCE_COLLECT_PROBES probes the scoring runs as a
    numpy mapInArrow over the corpus (probes shipped in the closure) with
    a strict-fold dot product that reproduces the JVM expression's IEEE
    operation order exactly; larger probe sets keep the JVM plan."""
    from pyspark.sql import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    probe_rows = p.limit(BRUTE_FORCE_COLLECT_PROBES + 1).collect()
    if len(probe_rows) <= BRUTE_FORCE_COLLECT_PROBES:
        pids = [r["probe_id"] for r in probe_rows]
        # element dtype mirrors the column: for array<float> the JVM
        # lambda x*y multiplies in FLOAT32 and only the running sum is
        # double — products are formed at storage precision and upcast
        # before the strict fold, so every IEEE step matches
        elem_np = (
            np.float32
            if dict(probes.dtypes)[vec_col] in ("array<float>",)
            else np.float64
        )
        pvecs = np.array(
            [r["probe_vec"] for r in probe_rows], dtype=elem_np
        ) if probe_rows else np.empty((0, 0), dtype=elem_np)
        # probe norm exactly as the JVM fold: sqrt(strict-sum(x*x))
        pnorm = (
            np.sqrt(_strict_dot((pvecs * pvecs).astype(np.float64)))
            if len(probe_rows)
            else np.empty(0)
        )
        id_type = dict(c.dtypes)["neighbor_id"]
        schema = f"probe_id {id_type}, neighbor_id {id_type}, cosine double"

        def score(batches):
            import pyarrow as pa

            for rb in batches:
                if rb.num_rows == 0:
                    continue
                nid = rb.column(0)
                varr = rb.column(1)
                if isinstance(varr, pa.ChunkedArray):
                    varr = varr.combine_chunks()
                flat = varr.flatten().to_numpy(zero_copy_only=False)
                vecs = flat.reshape(rb.num_rows, -1).astype(elem_np, copy=False)
                vnorm = np.sqrt(_strict_dot((vecs * vecs).astype(np.float64)))
                nid_np = nid.to_pandas().to_numpy()
                for j, pid in enumerate(pids):
                    dots = _strict_dot((vecs * pvecs[j][None, :]).astype(np.float64))
                    denom = pnorm[j] * vnorm
                    ok = (pnorm[j] > 0) & (vnorm > 0)
                    cos = np.where(ok, dots / np.where(ok, denom, 1.0), 0.0)
                    keep = nid_np != pid
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([pid] * int(keep.sum())),
                            pa.array(nid_np[keep]),
                            pa.array(cos[keep], type=pa.float64()),
                        ],
                        names=["probe_id", "neighbor_id", "cosine"],
                    )

        scored = c.mapInArrow(score, schema)
    else:
        scored = (
            c.crossJoin(broadcast(p))
            .where(F.col("probe_id") != F.col("neighbor_id"))
            .withColumn("cosine", _cosine(F.col("probe_vec"), F.col("vec")))
        )
    wnd = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 9001,
) -> DataFrame:
    """ANN top-k: random-hyperplane bucket join. Each vector gets one
    bucket id per hash table (sign pattern of ``n_bits`` projections);
    probe/corpus rows join on (table, bucket); exact cosine re-ranks the
    candidates. Recall < 1 by design; increase n_tables for more."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_tables, n_bits, seed)

    def bucket_cols(vec):
        out = []
        for t in range(n_tables):
            bits = [
                F.when(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(float(w)) for w in planes[t, b]]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0).cast("double"),
                        lambda acc, v: acc + v,
                    )
                    > 0,
                    F.lit(1 << b),
                ).otherwise(F.lit(0))
                for b in range(n_bits)
            ]
            acc = bits[0]
            for bb in bits[1:]:
                acc = acc + bb
            out.append(acc)
        return F.array(*out)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.posexplode(bucket_cols(F.col(vec_col))).alias("table", "bucket"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.posexplode(bucket_cols(F.col(vec_col))).alias("table", "bucket"),
    )
    cand = (
        c.join(broadcast(p), ["table", "bucket"])
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "probe_vec", "neighbor_id", "vec")
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("cosine", _cosine(F.col("probe_vec"), F.col("vec")))
    )
    wnd = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact embedding near-dup edges: all (a < b) with cosine ≥ threshold.
    Quadratic self-join — the correctness baseline and the oracle twin of
    the LSH-bucketed variant below. Fine for probe sets / golden tests,
    never for a 10^12-row corpus."""
    l = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        l.join(r, F.col("a") < F.col("b"))
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    threshold: float = 0.9,
    n_centroids: int | None = None,
    policy: str = "canonical_min",
    seed: int = 9001,
    target_bucket: int = 1024,
    chunk: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) for embedding-bearing training corpora: bucket the
    embeddings, find near-duplicate pairs ONLY within buckets, collapse
    each duplicate neighborhood to one kept representative.

    Bucketing: ``bucket_col`` names any precomputed semantic bucket (a
    class label, a topic id); when None, the classic SemDeDup recipe runs
    — k-means-lite centroids (ivf_train_centroids, driver-side sample)
    and every vector joins its nearest centroid's bucket (ivf_assign,
    nprobe=1). Either way the pairwise stage runs ONLY within buckets —
    nothing quadratic ever crosses buckets (the property that makes
    SemDeDup tractable where all-pairs cosine is not — at n vectors and
    B ~ n/k per bucket, candidate volume drops from C(n,2) to k*C(B,2)).

    Two scale disciplines (both round-5; before, k was a fixed 64 and the
    pairwise stage was a plain bucket-keyed self-join, so expected bucket
    mass grew as n/64 and one hot bucket meant one Θ(B²) task):

    * **k scales with n.** When ``n_centroids`` is None (the default) it
      is derived from one corpus count: k = clamp(ceil(n/target_bucket),
      1, 65536), so the expected bucket holds ``target_bucket`` vectors
      and total candidate volume stays ~n·target_bucket/2 no matter how
      big the corpus is. (SemDeDup itself used 50k clusters for LAION —
      fixed k is a bench-scale artifact, not the recipe.) The 65536 cap
      keeps the driver-side Lloyd training bounded; beyond it, bucket
      mass grows only as n/65536 and the chunk discipline below still
      bounds every task.
    * **Hot buckets never blow up a task.** Pair generation reuses the
      LSH lane's salted-full machinery (operators/lsh.pairs_from_bands,
      hot_policy="salted_full", one band per bucket): a bucket larger
      than ``chunk`` is cut into chunk-sized slices and every slice-pair
      becomes its own shuffle row, so a task expands at most chunk²
      candidate id pairs — full C(B,2) semantics, bounded memory, even
      in the adversarial all-vectors-one-bucket case. Vectors do NOT
      ride the band shuffle (an id is 8 bytes; an embedding is KBs, and
      a degenerate bucket would otherwise concentrate the corpus's
      vectors in one collect_set array): the candidate pairs join the
      vector table twice, then the cosine filter runs JVM-side.

    Representative policies, both deterministic:
      * ``canonical_min``: rep(v) = min id among {v} ∪ {within-bucket
        neighbors u < v with cosine ≥ threshold}. Depth-1,
        order-independent, and exactly re-derivable in ANSI SQL — the
        driver oracle hash-checks it.
      * ``cc``: rep(v) = min id of v's connected component over the
        within-bucket near-dup edges (operators/cc.py) — the transitive
        closure, for callers that want ε-chains collapsed too.

    Returns (id, bucket, rep_id, is_kept): one row per input vector,
    is_kept ⇔ rep_id == id (keep-set = the deduplicated corpus).
    Cosine is evaluated JVM-side (zip_with/aggregate — no Python in the
    pairwise hot path)."""
    if bucket_col is None:
        if n_centroids is None:
            # ONE metadata-cheap count drives the adaptive k; the
            # dimension is taken from the training sample itself (no
            # separate first() probe — the sample pass was happening
            # anyway).
            n = df.count()
            n_centroids = int(min(max(1, -(-n // target_bucket)), 65536))
        cent = ivf_train_centroids(
            df,
            n_centroids=n_centroids,
            vec_col=vec_col,
            sample_size=min(max(10_000, 8 * n_centroids), 200_000),
            seed=seed,
        )
        assigned = ivf_assign(df, cent, id_col=id_col, vec_col=vec_col, nprobe=1)
        base = assigned.select(
            F.col("id"), F.col("list_id").alias("bucket"), F.col("vec")
        )
        # base feeds FOUR consumers below (bands, va, vb, ids); without a
        # checkpoint Spark re-runs the ivf_assign mapInPandas kernel — a
        # full-corpus Python matmul pass — once per consumer (the same
        # multi-consumer discipline as containment_from_landmarks)
        base = base.localCheckpoint(eager=False)
    else:
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(bucket_col).alias("bucket"),
            F.col(vec_col).alias("vec"),
        )
    from .lsh import pairs_from_bands

    bands = base.where(F.col("bucket").isNotNull()).select(
        F.lit(0).alias("band_idx"), F.col("bucket").alias("band_hash"), "id"
    )
    cand = pairs_from_bands(bands, max_pairs_group=chunk, hot_policy="salted_full")
    va = base.select(F.col("id").alias("a"), F.col("vec").alias("va"))
    vb = base.select(F.col("id").alias("b"), F.col("vec").alias("vb"))
    pairs = (
        cand.join(va, "a")
        .join(vb, "b")
        .where(_cosine(F.col("va"), F.col("vb")) >= threshold)
        .select("a", "b")
    )
    ids = base.select("id", "bucket")
    if policy == "canonical_min":
        reps = pairs.groupBy(F.col("b").alias("id")).agg(F.min("a").alias("min_nb"))
        out = ids.join(reps, "id", "left").select(
            "id",
            "bucket",
            F.coalesce("min_nb", "id").alias("rep_id"),
            F.col("min_nb").isNull().alias("is_kept"),
        )
        return out
    if policy == "cc":
        from .cc import assign_clusters

        assigned = assign_clusters(ids.select("id"), pairs)
        return ids.join(assigned, "id").select(
            "id",
            "bucket",
            F.col("cluster_id").alias("rep_id"),
            (F.col("cluster_id") == F.col("id")).alias("is_kept"),
        )
    raise ValueError(f"unknown policy {policy!r}")


def hyperplane_bucket_keys(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_bits: int = 10,
    seed: int = 9001,
) -> DataFrame:
    """Random-hyperplane (SimHash) band keys for an embedding column:
    each vector emits one (band_idx=table, band_hash=sign pattern of
    ``n_bits`` projections) row per table — the bucket shape shared by
    the batch LSH self-join (cosine_near_dup_pairs_lsh) and the
    streaming embedding lane's persistent band store. One mapInPandas
    pass, vectorized matmul per Arrow batch, deterministic in ``seed``.
    Returns DataFrame(id, band_idx long, band_hash long)."""
    import pandas as pd
    from typing import Iterator

    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    id_type = dict(df.dtypes)[id_col]

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)  # (n, dim)
            out_ids, out_tables, out_buckets = [], [], []
            for t in range(n_tables):
                proj = vecs @ planes[t].T  # (n, n_bits)
                bits = (proj > 0).astype(np.int64)
                bucket = (bits << np.arange(n_bits)).sum(axis=1)
                out_ids.append(pdf[id_col].to_numpy())
                out_tables.append(np.full(len(pdf), t, dtype=np.int64))
                out_buckets.append(bucket)
            yield pd.DataFrame(
                {
                    "id": np.concatenate(out_ids),
                    "band_idx": np.concatenate(out_tables),
                    "band_hash": np.concatenate(out_buckets),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        bucketize, f"id {id_type}, band_idx long, band_hash long"
    )


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_tables: int = 16,
    n_bits: int = 10,
    seed: int = 9001,
    max_bucket: int = 2048,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane bucket
    self-join + exact cosine verify. A pair at angle θ collides in one
    table w.p. (1-θ/π)^n_bits; n_tables tables OR-ed ⇒ recall
    1-(1-p)^T (≈0.98 for cosine 0.9 at 16×10). Buckets larger than
    ``max_bucket`` are dropped (degenerate hubs — same cap discipline as
    LSH banding; at web scale a bucket that big means a near-constant
    embedding region better handled by exact clustering of that slice)."""
    buckets = hyperplane_bucket_keys(
        df, dim, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, n_bits=n_bits, seed=seed,
    )
    from .lsh import pairs_from_bands

    cand = pairs_from_bands(buckets, max_pairs_group=max_bucket)
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        cand.join(vecs.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
        .join(vecs.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def _bounded_vec_sample(
    df: DataFrame, vec_col: str, sample_size: int, seed: int
) -> np.ndarray:
    """ONE-pass bounded deterministic draw of ``sample_size`` vectors.

    orderBy(xxhash64)+limit compiles to TakeOrderedAndProject: each task
    keeps its top-``sample_size`` rows by hash order and only those merge
    on the driver — a single scan, no count() pre-pass, no full sort, and
    hash order makes the draw uniform and layout-invariant. (Replaces the
    round-3 count()-then-sample()-then-limit() triple pass.)"""
    pdf = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample_size)
        .toPandas()
    )
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float32)


# With adaptive SemDeDup k (up to 65536 centroids), a monolithic
# sims = X @ C.T materializes len(X) × k float32 — ~52 GB at the
# 200k-sample / 65536-centroid regime the adaptivity targets. Above
# _CENT_BLOCK centroids the argmax/top-n runs block-wise over C with a
# running best, bounding memory at len(X) × _CENT_BLOCK while computing
# the same dot products; at or below the threshold the original
# single-matmul path runs, keeping every small-k result bit-identical
# (BLAS float32 accumulation can differ in the last ulp across matrix
# shapes, so the tested/oracle-checked small-k regime never switches).
_CENT_BLOCK = 4096


def _blocked_argmax(x: np.ndarray, cent: np.ndarray,
                    block: int = _CENT_BLOCK) -> np.ndarray:
    """argmax_j (x @ cent.T)[i, j] with memory O(len(x) × block).
    Strict-greater updates keep the earliest index on ties — the same
    tie rule as np.argmax over the full matrix."""
    best = np.full(len(x), -np.inf, dtype=np.float32)
    idx = np.zeros(len(x), dtype=np.int64)
    for s in range(0, len(cent), block):
        sims = x @ cent[s:s + block].T
        bi = sims.argmax(axis=1)
        bv = sims[np.arange(len(x)), bi]
        upd = bv > best
        best[upd] = bv[upd]
        idx[upd] = bi[upd] + s
    return idx


def _blocked_topn(x: np.ndarray, cent: np.ndarray, n: int,
                  block: int = _CENT_BLOCK) -> np.ndarray:
    """Top-n centroid indices by similarity per row, descending, with
    memory O(len(x) × (block + n))."""
    best_val = np.full((len(x), 0), -np.inf, dtype=np.float32)
    best_idx = np.zeros((len(x), 0), dtype=np.int64)
    for s in range(0, len(cent), block):
        sims = x @ cent[s:s + block].T
        ids = np.arange(s, s + sims.shape[1], dtype=np.int64)
        cand_val = np.concatenate(
            [best_val, sims], axis=1)
        cand_idx = np.concatenate(
            [best_idx, np.broadcast_to(ids, sims.shape)], axis=1)
        # stable + lowest-index tie-break (ADVICE r5): carried best
        # entries sit left of the new block and hold smaller centroid
        # ids (inductively value-desc, id-asc), so a stable sort picks
        # the same ids the monolithic stable argsort would — crossing
        # _CENT_BLOCK can never flip a tied vector's nprobe lists
        order = np.argsort(-cand_val, axis=1, kind="stable")[:, :n]
        rows = np.arange(len(x))[:, None]
        best_val = cand_val[rows, order]
        best_idx = cand_idx[rows, order]
    return best_idx


def ivf_train_centroids(
    df: DataFrame,
    dim: int | None = None,
    n_centroids: int = 64,
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    iters: int = 5,
    seed: int = 9001,
) -> np.ndarray:
    """k-means-lite coarse quantizer: Lloyd iterations on a driver-side
    sample (the standard IVF recipe — training is O(sample), never a full
    scan; the draw itself is one bounded pass, _bounded_vec_sample).
    Returns (n_centroids, dim) float32, L2-normalized. ``dim`` is
    accepted for API compatibility but unused — the sample itself carries
    the dimensionality (no separate probe action needed)."""
    sample = _bounded_vec_sample(df, vec_col, sample_size, seed)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        if len(cent) <= _CENT_BLOCK:
            sims = sample @ cent.T
            assign = sims.argmax(axis=1)
            for c in range(len(cent)):
                members = sample[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-9)
        else:
            # big-k regime: blocked argmax (memory-bounded, above) and a
            # sort-grouped mean update — O(occupied clusters), never an
            # O(k) scan of mostly-empty clusters per iteration. Stable
            # sort keeps each cluster's members in original order, so
            # the per-cluster mean is bit-identical to the masked path.
            assign = _blocked_argmax(sample, cent)
            order = np.argsort(assign, kind="stable")
            sa = assign[order]
            starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
            for i, st in enumerate(starts):
                en = starts[i + 1] if i + 1 < len(starts) else len(sa)
                v = sample[order[st:en]].mean(axis=0)
                cent[sa[st]] = v / max(np.linalg.norm(v), 1e-9)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """(id, list_id, vec): each vector replicated into its ``nprobe``
    nearest inverted lists (corpus side uses nprobe=1; probe side uses
    nprobe>1 to trade recall for scan width). Repartitioned by list_id so
    each inverted list is scan-local."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(df.dtypes)[id_col]
    vec_type = dict(df.dtypes)[vec_col]
    cent = centroids.astype(np.float32)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-9)
            if len(cent) <= _CENT_BLOCK:
                sims = norm @ cent.T  # (n, C)
                # stable ⇒ ties resolve to the lowest centroid id, the
                # same rule as the blocked path (ADVICE r5)
                top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            else:
                # adaptive-k regime: a 10k-row Arrow batch × 65536
                # centroids would be a 2.6 GB sims matrix per Python
                # worker — run the top-n block-wise instead
                top = _blocked_topn(norm, cent, nprobe)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(), nprobe),
                    "list_id": top.ravel().astype(np.int64),
                    "vec": list(np.repeat(pdf[vec_col].to_numpy(), nprobe)),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, f"id {id_type}, list_id long, vec {vec_type}"
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN query: corpus lives in 1 list each; every probe scans its
    ``nprobe`` nearest lists. The join is on list_id — at scale the corpus
    side is bucketed/partitioned by list_id on disk so a probe batch reads
    only its lists (partition pruning), the IVF point."""
    from pyspark.sql import Window

    c = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("id").alias("neighbor_id"), "list_id", F.col("vec").alias("v")
    )
    p = ivf_assign(probes, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col("id").alias("probe_id"), "list_id", F.col("vec").alias("pv")
    )
    cand = (
        c.join(broadcast(p), "list_id")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("cosine", _cosine(F.col("pv"), F.col("v")))
    )
    wnd = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bounded ANN scale path
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ks: int = 256,
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    iters: int = 8,
    seed: int = 9001,
) -> np.ndarray:
    """Train PQ codebooks (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011): split each L2-normalized vector into
    ``m`` subvectors of dim/m; k-means each subspace independently on a
    bounded driver sample (same discipline as ivf_train_centroids — O(
    sample), never a full scan). Returns (m, ks, dim//m) float32.

    Why it matters at 100 TB: a dim=64 float32 embedding is 256 bytes; its
    PQ code is m bytes (32x smaller at m=8). The corpus side of an ANN scan
    becomes small enough to keep hot, and distance evaluation drops to m
    table lookups per candidate (ADC)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sample = _bounded_vec_sample(df, vec_col, sample_size, seed)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(ks, len(sample)), sub), np.float32)
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cent = x[rng.choice(len(x), size=books.shape[1], replace=False)].copy()
        for _ in range(iters):
            # squared-L2 assignment via the dot trick (constant ||x||² dropped)
            d2 = (cent**2).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code binary): each vector L2-normalized, each subvector replaced
    by its nearest codeword index — m bytes per row (ks ≤ 256). Narrow
    stage, vectorized per Arrow batch."""
    import pandas as pd
    from typing import Iterator

    id_type = dict(df.dtypes)[id_col]
    books = codebooks.astype(np.float32)
    m, ks, sub = books.shape
    if ks > 256:
        raise ValueError("pq_encode packs codes as uint8: ks must be <= 256")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        norms2 = [(books[j] ** 2).sum(axis=1) for j in range(m)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-9)
            codes = np.empty((len(vecs), m), np.uint8)
            for j in range(m):
                x = vecs[:, j * sub : (j + 1) * sub]
                d2 = norms2[j][None, :] - 2.0 * (x @ books[j].T)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "code": [c.tobytes() for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(encode, f"id {id_type}, code binary")


def pq_topk(
    corpus_codes: DataFrame,
    probes: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank_with: DataFrame | None = None,
    rerank_shortlist: int = 50,
    max_probes: int = 8192,
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k: probes stay exact
    (L2-normalized float), corpus rows are m-byte PQ codes. Per probe, one
    (m, ks) lookup table LUT[j][c] = <probe_sub_j, codeword_jc>; a
    candidate's approximate cosine is sum_j LUT[j][code_j] — m gathers, no
    float vector ever read from the corpus side. Probes broadcast (small
    by construction); the corpus scan is narrow and embarrassingly
    parallel. Returns (probe_id, neighbor_id, adc_cosine, rank); with
    ``rerank_with`` (the corpus DataFrame), the ADC top-``rerank_shortlist``
    is exactly re-ranked by true cosine and the columns become
    (probe_id, neighbor_id, cosine, rank) — IVFADC+R semantics."""
    import pandas as pd
    from typing import Iterator

    from pyspark.sql import Window

    books = codebooks.astype(np.float32)
    m, ks, sub = books.shape
    # The probes-broadcast-small contract is ENFORCED, not assumed: the
    # collect is limit-bounded (cc.py incremental-limit discipline), so a
    # caller handing a corpus-sized probe set gets a clear error, never a
    # driver OOM.
    probe_pdf = probes.select(id_col, vec_col).limit(max_probes + 1).toPandas()
    if len(probe_pdf) > max_probes:
        raise ValueError(
            f"pq_topk probe side exceeds max_probes={max_probes}; the ADC "
            "LUTs are built driver-side under a probes-broadcast-small "
            "contract — split the probe set into batches or raise "
            "max_probes deliberately"
        )
    pvecs = np.stack(probe_pdf[vec_col].to_numpy()).astype(np.float32)
    pvecs /= np.maximum(np.linalg.norm(pvecs, axis=1, keepdims=True), 1e-9)
    # (P, m, ks): LUT[p, j, c] = <probe_p subvector j, codeword c>
    luts = np.einsum(
        "pjs,jcs->pjc", pvecs.reshape(len(pvecs), m, sub), books, optimize=True
    )
    pids = probe_pdf[id_col].to_numpy()
    id_type = dict(corpus_codes.dtypes)["id"]
    shortlist_k = k if rerank_with is None else max(k, rerank_shortlist)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(b"".join(pdf["code"]), np.uint8).reshape(n, m)
            # scores (P, n): gather each probe's LUT at the corpus codes
            scores = np.zeros((len(pids), n), np.float32)
            for j in range(m):
                scores += luts[:, j, :][:, codes[:, j]]
            ids = pdf["id"].to_numpy()
            # per-batch top-k pre-reduction: only rows that can still
            # reach the global top-k leave the task — emitting the full
            # P x n cross product would put P x N rows through the
            # window shuffle (and multi-GB frames through Arrow) at the
            # billion-code scale this path exists for. kb = k+1 absorbs
            # one self-match; ties AT the kb-th score are all kept, so
            # the global (score desc, neighbor_id asc) order stays
            # deterministic and exact.
            kb = min(n, shortlist_k + 1)
            kth = np.partition(scores, n - kb, axis=1)[:, n - kb]
            keep = scores >= kth[:, None]
            cnt = keep.sum(axis=1)
            yield pd.DataFrame(
                {
                    "probe_id": np.repeat(pids, cnt),
                    "neighbor_id": ids[np.nonzero(keep)[1]],
                    "adc_cosine": scores[keep].astype(np.float64),
                }
            )

    scored = corpus_codes.mapInPandas(
        scan, f"probe_id {id_type}, neighbor_id {id_type}, adc_cosine double"
    ).where(F.col("probe_id") != F.col("neighbor_id"))
    wnd = Window.partitionBy("probe_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= shortlist_k)
        .select("probe_id", "neighbor_id", "adc_cosine", "rank")
    )
    if rerank_with is None:
        return shortlist

    # Exact re-rank (the "+R" of IVFADC+R, Jégou et al. §V): the ADC
    # shortlist is tiny (probes × shortlist rows), so reading the true
    # float vectors for JUST those rows costs nothing at any scale — one
    # broadcast-sized join against the corpus — and restores exact cosine
    # ordering within the shortlist.
    nbr = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    probe_id_type = dict(rerank_with.dtypes)[id_col]
    pr = rerank_with.sparkSession.createDataFrame(
        [(pid, [float(x) for x in v]) for pid, v in zip(pids.tolist(), pvecs)],
        schema=f"probe_id {probe_id_type}, _pv array<float>",
    )
    exact = (
        shortlist.select("probe_id", "neighbor_id")
        .join(nbr, "neighbor_id")
        .join(F.broadcast(pr), "probe_id")
        .withColumn("cosine", _cosine(F.col("_pv"), F.col("_nv")))
    )
    wnd2 = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(wnd2))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
