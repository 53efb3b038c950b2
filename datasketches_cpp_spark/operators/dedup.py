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
        sig_df = compute_signatures(
            df, id_col, content_col, cfg, kind=kind, byte_stride=byte_stride
        )
    pairs = candidate_pairs(
        sig_df, max_pairs_group=max_pairs_group, hot_policy=hot_policy
    )
    verified = verify_pairs(pairs, sig_df, cfg, use_simhash=use_simhash)
    edges = verified.where("passed").select("a", "b")
    assignments = assign_clusters(df.select(F.col(id_col).alias("id")), edges)
    return assignments, verified.where("passed"), sig_df


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
