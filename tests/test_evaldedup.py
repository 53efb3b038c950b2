"""Dedup evaluation harness tests: hand-computed pair confusion,
per-kind recall, plan shape (counting identities — no pair rows), and
the end-to-end property that the full multi-lane pipeline scores
perfect pair recall on the planted synthetic corpus."""

from __future__ import annotations

import pytest

from datasketches_cpp_spark.operators.evaldedup import (
    pair_confusion,
    recall_by_kind,
)


@pytest.fixture()
def hand(spark):
    assignments = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k2"), ("e", "k3"),
         ("f", "k3")],
        "id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [
            ("a", 1, "unique"), ("b", 1, "near_pixel"),
            ("c", 2, "unique"),
            ("d", 3, "unique"), ("e", 3, "exact"),
            ("f", 4, "unique"),
        ],
        "image_id string, dup_group long, dup_kind string",
    )
    return assignments, truth


def test_pair_confusion_hand(hand):
    a, t = hand
    row = pair_confusion(a, t).collect()[0]
    # truth pairs: group1 {a,b} + group3 {d,e} = 2
    # predicted: C(3,2) in k1 + C(2,2)=1 in k3 = 4
    # tp: {a,b} same cluster = 1 ({d,e} split k2/k3)
    assert row.truth_pairs == 2
    assert row.predicted_pairs == 4
    assert row.tp_pairs == 1
    assert row.precision == pytest.approx(0.25)
    assert row.recall == pytest.approx(0.5)


def test_recall_by_kind_hand(hand):
    a, t = hand
    out = {
        r.dup_kind: (r.truth_pairs, r.recovered_pairs, r.recall)
        for r in recall_by_kind(a, t).collect()
    }
    assert out == {
        "near_pixel": (1, 1, pytest.approx(1.0)),
        "exact": (1, 0, pytest.approx(0.0)),
    }


def test_perfect_and_empty_edges(spark):
    a = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "id string, cluster_id string"
    )
    t_perfect = spark.createDataFrame(
        [("a", 1, "unique"), ("b", 1, "exact")],
        "image_id string, dup_group long, dup_kind string",
    )
    row = pair_confusion(a, t_perfect).collect()[0]
    assert (row.precision, row.recall) == (1.0, 1.0)
    # no truth pairs at all: recall defined as 1.0, precision counts FPs
    t_all_unique = spark.createDataFrame(
        [("a", 1, "unique"), ("b", 2, "unique")],
        "image_id string, dup_group long, dup_kind string",
    )
    row = pair_confusion(a, t_all_unique).collect()[0]
    assert row.truth_pairs == 0 and row.recall == 1.0
    assert row.predicted_pairs == 1 and row.precision == 0.0


def test_no_pair_materialization(spark, hand):
    """The plan must be aggregations over the joined frame — no
    self-join of assignments with assignments (pair explosion)."""
    a, t = hand
    plan = pair_confusion(a, t)._jdf.queryExecution().optimizedPlan().toString()
    # exactly one join of assignments->truth per branch; no join whose
    # both sides stem from assignments
    assert plan.count("Join Inner") <= 3  # the three metric branches
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_recall_by_config_on_planted_corpus(spark):
    """The harness exposes the jaccard_threshold tradeoff the way a
    100 TB operator would use it: at the default 0.8 threshold the
    near_caption twins (trigram-Jaccard ~0.6-0.75 by construction) are
    CORRECTLY excluded while the ≥0.8-overlap kinds score perfect pair
    recall; retuned to 0.55 every planted kind is fully recovered at
    pair precision 1.0."""
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.operators.sigkernel import SigConfig
    from datasketches_cpp_spark.sources.images import generate_images

    pdf, truth_pdf = generate_images(500, seed=97)
    images = spark.createDataFrame(pdf)
    truth = spark.createDataFrame(truth_pdf)

    res = dedup_images(images)  # default threshold 0.8
    kinds = {r.dup_kind: r for r in recall_by_kind(res["assignments"], truth).collect()}
    assert set(kinds) == {"exact", "near_pixel", "near_caption", "substring"}
    for k in ("exact", "near_pixel", "substring"):
        assert kinds[k].recall == 1.0, kinds[k]
    assert kinds["near_caption"].recall < 0.2  # below-threshold by design

    res = dedup_images(images, SigConfig(jaccard_threshold=0.55))
    kinds = {r.dup_kind: r for r in recall_by_kind(res["assignments"], truth).collect()}
    for k, r in kinds.items():
        assert r.recovered_pairs == r.truth_pairs, (k, r)
    conf = pair_confusion(res["assignments"], truth).collect()[0]
    assert conf.recall == 1.0 and conf.precision == 1.0
