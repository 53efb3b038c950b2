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
    """C(n, 2) as a long expression."""
    return (F.col(col) * (F.col(col) - F.lit(1)) / F.lit(2)).cast("long")


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
