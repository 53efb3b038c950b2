"""Distributed dedup evaluation — pair recall/precision vs a truth
frame, with NO pair materialization on the predicted side.

Tuning a 100 TB dedup run (band counts, hamming radii, edge_policy)
needs recall and precision against labeled truth, but the naive
formulation — enumerate all predicted pairs and join them to truth
pairs — explodes: a single 10^6-member predicted cluster is 5·10^11
pairs. This module computes exact PAIR-level metrics from counting
identities instead:

* predicted pairs        = Σ_c C(n_c, 2)            (one groupBy)
* true-positive pairs    = Σ_{c,g} C(n_{c,g}, 2)    (one groupBy on the
  (cluster, truth-group) pair — n_{c,g} = members of truth group g that
  landed in predicted cluster c)
* truth pairs            = Σ_g C(m_g, 2)            (one groupBy)

precision = TP / predicted, recall = TP / truth — exact, three narrow
aggregations, map-side partial agg everywhere, never a pair row. The
per-kind recall variant buckets the truth side by its ``dup_kind``
label (each truth group has one kind in the synthetic corpus; general
corpora use the group's min kind).

Singleton clusters/groups contribute zero pairs automatically (C(1,2)
= 0), so unlabeled/unique rows need no filtering.

Reference: apache/datasketches-cpp tests assert estimator error bounds;
this is the analogous measurement harness for the pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    """C(n, 2) as a long expression — INTEGER arithmetic throughout
    (n*(n-1) is even, so `div 2` is exact): `/` would route through a
    double and lose exactness past 2^53 pairs, breaking the module's
    exact-counting claim for giant clusters."""
    return F.expr(
        f"CAST({col} AS BIGINT) * (CAST({col} AS BIGINT) - 1) div 2"
    )


def pair_confusion(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    truth_id_col: str = "image_id",
    group_col: str = "dup_group",
) -> DataFrame:
    """One row: (truth_pairs, predicted_pairs, tp_pairs, precision,
    recall) — exact pair-level confusion computed by counting, see the
    module docstring. The truth join is an inner join on id: rows
    missing from either side are outside the evaluation universe."""
    joined = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    ).join(
        truth.select(
            F.col(truth_id_col).alias("_id"), F.col(group_col).alias("_g")
        ),
        "_id",
    )
    pred = joined.groupBy("_c").agg(F.count(F.lit(1)).alias("n")).agg(
        F.sum(_c2("n")).alias("predicted_pairs")
    )
    tru = joined.groupBy("_g").agg(F.count(F.lit(1)).alias("n")).agg(
        F.sum(_c2("n")).alias("truth_pairs")
    )
    tp = joined.groupBy("_c", "_g").agg(F.count(F.lit(1)).alias("n")).agg(
        F.sum(_c2("n")).alias("tp_pairs")
    )
    out = tru.crossJoin(pred).crossJoin(tp)  # three 1-row frames
    # an empty id intersection sums to NULL — report 0 pairs (and the
    # vacuous precision/recall of 1.0), never NULL counts that would
    # read as a perfect score on a broken join
    out = out.select(
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("truth_pairs", "predicted_pairs", "tp_pairs")
        ]
    )
    return out.select(
        "truth_pairs",
        "predicted_pairs",
        "tp_pairs",
        F.when(
            F.col("predicted_pairs") > 0,
            F.col("tp_pairs") / F.col("predicted_pairs"),
        ).otherwise(F.lit(1.0)).alias("precision"),
        F.when(
            F.col("truth_pairs") > 0,
            F.col("tp_pairs") / F.col("truth_pairs"),
        ).otherwise(F.lit(1.0)).alias("recall"),
    )


def recall_by_kind(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    truth_id_col: str = "image_id",
    group_col: str = "dup_group",
    kind_col: str = "dup_kind",
) -> DataFrame:
    """(dup_kind, truth_pairs, recovered_pairs, recall) per kind.
    A truth group's kind is its members' min kind label excluding
    'unique' (the synthetic corpus labels first members 'unique' and
    dup members with the pair's kind); all-unique groups are singleton
    non-pairs and drop out via C(1,2) = 0."""
    joined = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    ).join(
        truth.select(
            F.col(truth_id_col).alias("_id"),
            F.col(group_col).alias("_g"),
            F.col(kind_col).alias("_k"),
        ),
        "_id",
    )
    gkind = joined.groupBy("_g").agg(
        F.min(F.when(F.col("_k") != "unique", F.col("_k"))).alias("kind"),
        F.count(F.lit(1)).alias("n"),
    )
    tru = gkind.groupBy("kind").agg(F.sum(_c2("n")).alias("truth_pairs"))
    tp_g = joined.groupBy("_g", "_c").agg(F.count(F.lit(1)).alias("n")).groupBy(
        "_g"
    ).agg(F.sum(_c2("n")).alias("tp"))
    rec = (
        gkind.join(tp_g, "_g", "left")
        .groupBy("kind")
        .agg(F.sum(F.coalesce("tp", F.lit(0))).alias("recovered_pairs"))
    )
    return (
        tru.join(rec, "kind")
        .filter(F.col("truth_pairs") > 0)
        .select(
            F.col("kind").alias("dup_kind"),
            "truth_pairs",
            "recovered_pairs",
            (F.col("recovered_pairs") / F.col("truth_pairs")).alias("recall"),
        )
    )


def _c2d(col):
    """C(n, 2) as an exact-integer-valued DOUBLE expression. Doubles so
    the identity also evaluates when a single cluster exceeds 3e9
    members (where n*(n-1) overflows int64): every term and sum stays
    integer-valued and exact below 2^53 pairs; past that the relative
    error is ~1e-16 — irrelevant for an agreement metric."""
    n = F.col(col).cast("double")
    return n * (n - F.lit(1.0)) / F.lit(2.0)


def clustering_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    a_cluster: str = "cluster_id",
    b_cluster: str = "cluster_id",
) -> DataFrame:
    """Pair-level agreement between two clusterings of the same items —
    the standard way to compare two dedup POLICIES (e.g. exact vs
    normalized text, pHash-only vs multi-lane fused) without labeled
    truth. One row: item count, total pairs, the pair contingency
    (n11 same-cluster in both, n10 only in A, n01 only in B, n00
    neither), the Rand index (n11+n00)/P and the Adjusted Rand Index.

    Same counting discipline as pair_confusion: never a pair row —
    S_A = Σ C(n_c,2) over A's clusters, S_B over B's, S_AB over the
    joint (a,b) groups; n11 = S_AB, n10 = S_A−S_AB, n01 = S_B−S_AB,
    n00 = P−S_A−S_B+S_AB. Three narrow groupBys (map-side partial agg)
    + an inner join on id; the four scalar aggregates cross-join back
    as 1-row broadcasts. ARI = (S_AB − S_A·S_B/P) / ((S_A+S_B)/2 −
    S_A·S_B/P), defined as 1.0 when the denominator is 0 (both
    clusterings trivial: all-singletons or one cluster)."""
    j = (
        a.select(F.col(id_col).alias("_id"), F.col(a_cluster).alias("_a"))
        .join(
            b.select(
                F.col(id_col).alias("_id"), F.col(b_cluster).alias("_b")
            ),
            "_id",
        )
    )
    z = F.lit(0.0)
    sa = (
        j.groupBy("_a").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(_c2d("n")), z).alias("sa"))
    )
    sb = (
        j.groupBy("_b").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(_c2d("n")), z).alias("sb"))
    )
    sab = (
        j.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(_c2d("n")), z).alias("sab"))
    )
    nn = j.agg(F.count(F.lit(1)).alias("n_items"))
    p = F.col("n_items").cast("double") * (
        F.col("n_items").cast("double") - F.lit(1.0)
    ) / F.lit(2.0)
    n11 = F.col("sab")
    n10 = F.col("sa") - F.col("sab")
    n01 = F.col("sb") - F.col("sab")
    n00 = p - F.col("sa") - F.col("sb") + F.col("sab")
    exp = F.col("sa") * F.col("sb") / p
    ari_den = (F.col("sa") + F.col("sb")) / F.lit(2.0) - exp
    ari = F.when(ari_den == z, F.lit(1.0)).otherwise(
        (F.col("sab") - exp) / ari_den
    )
    return (
        nn.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(sab))
        .select(
            "n_items",
            p.alias("pairs_total"),
            n11.alias("n11"),
            n10.alias("n10"),
            n01.alias("n01"),
            n00.alias("n00"),
            F.round((n11 + n00) / p, 6).alias("rand_index"),
            F.round(ari, 6).alias("adjusted_rand"),
        )
    )
