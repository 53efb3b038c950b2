"""End-to-end near-duplicate detection pipeline (SURVEY.md §2B S0-S8).

    content table ──S1/S2──▶ signatures ──S4-S6──▶ candidate pairs
        ──S7──▶ verified pairs ──S8──▶ cluster assignments

Each stage is a DataFrame → DataFrame function; `dedup_text` / `dedup`
compose them. The signature stage is the only pass over raw content; every
later stage moves ids + fixed-size signatures only, so the 100 TB scan cost
is paid exactly once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .cc import assign_clusters
from .lsh import candidate_pairs
from .minhash import compute_signatures
from .sigkernel import SigConfig
from .verify import verify_pairs


def dedup(
    df: DataFrame,
    id_col: str,
    content_col: str,
    cfg: SigConfig | None = None,
    kind: str = "text",
    max_pairs_group: int = 256,
    use_simhash: bool = True,
    byte_stride: int = 1,
    sig_df: DataFrame | None = None,
    hot_policy: str = "chain_hub",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (assignments, verified_pairs, signatures).

    assignments:    (id, cluster_id) — cluster_id = min member id
    verified_pairs: (a, b, jaccard, mh_jaccard, simhash_hamming,
                     exact_match, passed) — passed rows only
    signatures:     the S1 output, reusable for checkpointing

    ``hot_policy``: skew defusal for degenerate LSH bands — "chain_hub"
    (default contract: capped connectivity edges) or "salted_full" (full
    pair semantics, chunk-bounded task memory); see operators/lsh.py.
    """
    cfg = cfg or SigConfig()
    if sig_df is None:
        # signatures feed THREE consumers (banding + both verify sides);
        # without a checkpoint Catalyst clones the Python signature stage
        # into each subtree and the scan+hash work runs 3× per action
        # (guide §2.4: share the computation, r6 measurement: the sig
        # stage alone is ~1.3 s warm at 50k docs, ×3 in the old plan)
        sig_df = compute_signatures(
            df, id_col, content_col, cfg, kind=kind, byte_stride=byte_stride
        ).localCheckpoint(eager=False)
    pre_filter = exact_mode_prefilter(sig_df, cfg, use_simhash=use_simhash)
    pairs = candidate_pairs(
        sig_df,
        max_pairs_group=max_pairs_group,
        hot_policy=hot_policy,
        pre_dedup_filter=pre_filter,
    )
    verified = verify_pairs(pairs, sig_df, cfg, use_simhash=use_simhash)
    edges = verified.where("passed").select("a", "b")
    assignments = assign_clusters(df.select(F.col(id_col).alias("id")), edges)
    return assignments, verified.where("passed"), sig_df


#: row-count ceiling under which the signature table is collected and
#: broadcast into the Python candidate pruner (padded kmv matrix ≈
#: rows × kmv_k × 8 bytes → ≲ 160 MB at the default 150k/128). Above it
#: the prefilter is skipped entirely and the plan is exactly the pre-r6
#: one (candidate pairs → dedup shuffle → verify joins).
PREFILTER_MAX_SIG_ROWS = 150_000


def exact_mode_prefilter(sig_df: DataFrame, cfg: SigConfig, use_simhash: bool):
    """Candidate-pair pruner applied BEFORE the pair dropDuplicates
    shuffle (lsh.pairs_from_bands ``pre_dedup_filter`` hook).

    Rationale (r6, guide §2.3/§8): on a degenerate corpus the banding
    stage emits tens of millions of candidate pairs of which only a few
    thousand verify; the old plan shuffled every candidate through the
    pair dedup AND two sort-merge joins carrying kmv_k longs per side
    (~1 KB/pair) into the Python kernel. This pruner broadcasts the
    (small) signature table to the Python workers ONCE and screens the
    freshly exploded pairs in-stage — only (a, b) crosses the Arrow
    boundary, the signature arrays never travel per pair — so the pair
    dedup shuffle and the verify joins see thousands of rows, not
    millions. (A JVM broadcast-join variant was measured first: copying
    the two kmv arrays into every joined row + per-row array_intersect
    hash sets cost 22 s at 33.5M pairs vs 10 s for this path.)

    Exactness contract (the verified output must be byte-identical):
    * the keep-decision runs the SAME kernels verify_pairs runs
      (_kmv_jaccard_flat + hamming64), so "passes verification" is
      decided once, identically, by shared code — kept pairs re-verify
      downstream with full diagnostics;
    * estimation-mode pairs (either theta < 2^63) are kept
      unconditionally: estimation-mode Jaccard could in principle differ
      from the exact-mode intuition, so the downstream kernel stays the
      only decision maker there (it recomputes the identical value
      anyway — the prune is merely not allowed to drop them);
    * sig tables larger than PREFILTER_MAX_SIG_ROWS: no pruning at all
      (returns None) — at that scale the broadcast would not fit and the
      shuffled verify plan is the right one.
    """
    n_sigs = sig_df.count()  # sig_df is checkpointed by callers: one cheap job
    if n_sigs == 0 or n_sigs > PREFILTER_MAX_SIG_ROWS:
        return None

    import numpy as np

    from .sigkernel import hamming64
    from .verify import _kmv_jaccard_flat

    pdf = sig_df.select("id", "kmv_theta", "kmv_sig", "simhash").toPandas()
    import pandas as pd

    idx = pd.Index(pdf["id"])
    sigs = pdf["kmv_sig"].to_numpy()
    lens = np.fromiter((len(s) for s in sigs), dtype=np.int64, count=len(sigs))
    maxlen = max(int(lens.max()), 1)
    # padded row-major matrix: row i = doc i's kmv sig, sentinel-padded —
    # one fancy-index gather per batch rebuilds the ragged pair columns
    pad = np.full((len(sigs), maxlen), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    for i, s in enumerate(sigs):
        if len(s):
            pad[i, : len(s)] = np.asarray(s, np.int64).view(np.uint64)
    thetas = pdf["kmv_theta"].to_numpy(dtype=np.int64)
    shs = pdf["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
    sc = sig_df.sparkSession.sparkContext
    bc = sc.broadcast((idx, pad, lens, thetas, shs))
    thr = cfg.jaccard_threshold
    max_ham = cfg.simhash_hamming
    id_type = dict(sig_df.dtypes)["id"]

    def prune(pairs_df: DataFrame) -> DataFrame:
        assert pairs_df.columns == ["a", "b"], pairs_df.columns

        def run(batches):
            import pyarrow as pa

            index, mat, ln, th, sh = bc.value
            col_grid = np.arange(mat.shape[1])[None, :]
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                a_arr = rb.column(0)
                b_arr = rb.column(1)
                ia = index.get_indexer(a_arr.to_pandas())
                ib = index.get_indexer(b_arr.to_pandas())
                la, lb = ln[ia], ln[ib]
                va = mat[ia][col_grid < la[:, None]]
                vb = mat[ib][col_grid < lb[:, None]]
                kj = _kmv_jaccard_flat(va, la, vb, lb, th[ia], th[ib])
                keep = (th[ia] != -1) | (th[ib] != -1) | (kj >= thr)
                if use_simhash:
                    keep |= hamming64(sh[ia], sh[ib]) <= max_ham
                keep_pa = pa.array(keep)
                yield pa.RecordBatch.from_arrays(
                    [a_arr.filter(keep_pa), b_arr.filter(keep_pa)],
                    names=["a", "b"],
                )

        return pairs_df.mapInArrow(run, f"a {id_type}, b {id_type}")

    return prune


def cluster_stats(assignments: DataFrame) -> DataFrame:
    """Per-cluster-size histogram: how many clusters of each size — the
    standard dedup QA readout (JVM-only aggregates)."""
    return (
        assignments.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("num_clusters"))
        .orderBy("cluster_size")
    )


def duplicate_rate(assignments: DataFrame) -> DataFrame:
    """One row: total docs, distinct clusters, duplicate docs (docs beyond
    their cluster's first), dup fraction."""
    return assignments.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct("cluster_id").alias("num_clusters"),
        (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias("duplicate_docs"),
        (
            (F.count(F.lit(1)) - F.countDistinct("cluster_id"))
            / F.count(F.lit(1))
        ).alias("dup_fraction"),
    )


def select_representatives(
    assignments: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """The keep-best curation step after clustering: per duplicate cluster,
    keep the HIGHEST-scoring member (ties break to the smallest id), so
    dedup preserves the best copy — longest text, highest quality score,
    best resolution — instead of an arbitrary one.

    `assignments` is any (id, cluster_id) table (operators/dedup.dedup,
    imagededup, semantic_dedup ids renamed); `scores` carries (id_col,
    score_col). One window shuffle partitioned by cluster_id — cluster
    sizes are bounded by the dedup semantics upstream (the hot-policy cap
    keeps degenerate clusters from concentrating a partition), so the
    window never sees unbounded groups.

    Returns (id, cluster_id, <score_col>, rep_id, is_kept): rep_id is the
    cluster's kept member, is_kept ⇔ id == rep_id."""
    from pyspark.sql import Window

    sc = scores.select(F.col(id_col).alias("id"), F.col(score_col))
    # LEFT join: a member the scorer skipped (decode failure upstream)
    # must still appear in the output — an inner join would silently drop
    # it from the audit, and a cluster whose every member is unscored
    # would vanish. Unscored members sort last (desc_nulls_last), so they
    # are kept only when nothing scored competes.
    joined = assignments.join(sc, "id", "left")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc_nulls_last(), F.asc("id")
    )
    return (
        joined.withColumn("rep_id", F.first("id").over(w))
        .withColumn("is_kept", F.col("id") == F.col("rep_id"))
    )


def caption_conflicts(
    assignments: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Cross-modal consistency audit for an image+caption corpus: per
    image CLUSTER, how many distinct canonical captions its members
    carry. A multi-member cluster whose pixels deduplicate but whose
    captions disagree (``caption_conflict``) is the classic mislabeled/
    scraped-alt-text signal — route those clusters to keep-best
    (select_representatives) or human QA instead of blind collapse.

    Captions compare in canonical form (operators/textnorm.normalized_
    text: lower → accent fold → punct strip → ws collapse) so trivial
    decoration differences don't count as conflicts. ONE join to pull
    captions onto the assignment table and ONE groupBy(cluster) —
    count + count_distinct, map-side partial agg; nothing else moves."""
    from .textnorm import normalized_text

    cap = images.select(
        F.col(id_col).alias("id"),
        normalized_text(F.col(caption_col)).alias("_cap"),
    )
    return (
        assignments.join(cap, "id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("_cap").alias("n_captions"),
        )
        .withColumn(
            "caption_conflict",
            (F.col("n_members") >= 2) & (F.col("n_captions") >= 2),
        )
    )
