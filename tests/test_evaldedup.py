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


# ---------------------------------------------------------------------------
# clustering_agreement — Rand / ARI by counting, vs a brute-force pair twin
# ---------------------------------------------------------------------------


def _pair_twin(la, lb):
    """Brute-force pair contingency + Rand/ARI over explicit pairs."""
    import itertools

    ids = sorted(la)
    n11 = n10 = n01 = n00 = 0
    for x, y in itertools.combinations(ids, 2):
        sa, sb = la[x] == la[y], lb[x] == lb[y]
        n11 += sa and sb
        n10 += sa and not sb
        n01 += (not sa) and sb
        n00 += not sa and not sb
    p = n11 + n10 + n01 + n00
    sa_, sb_, sab = n11 + n10, n11 + n01, n11
    exp = sa_ * sb_ / p
    den = (sa_ + sb_) / 2 - exp
    ari = 1.0 if den == 0 else (sab - exp) / den
    return n11, n10, n01, n00, round((n11 + n00) / p, 6), round(ari, 6)


def test_clustering_agreement_matches_pair_twin(spark):
    from datasketches_cpp_spark.operators.evaldedup import clustering_agreement

    la = {1: "x", 2: "x", 3: "x", 4: "y", 5: "y", 6: "z"}
    lb = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2}
    a = spark.createDataFrame(list(la.items()), "id long, cluster_id string")
    b = spark.createDataFrame(list(lb.items()), "id long, cluster_id long")
    [r] = clustering_agreement(a, b).collect()
    n11, n10, n01, n00, rand, ari = _pair_twin(la, lb)
    assert (r.n11, r.n10, r.n01, r.n00) == (n11, n10, n01, n00)
    assert r.n_items == 6 and r.pairs_total == 15.0
    assert r.rand_index == rand and r.adjusted_rand == ari


def test_clustering_agreement_identical_and_degenerate(spark):
    from datasketches_cpp_spark.operators.evaldedup import clustering_agreement

    a = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "id long, cluster_id long"
    )
    [r] = clustering_agreement(a, a).collect()
    assert r.rand_index == 1.0 and r.adjusted_rand == 1.0
    # all singletons on both sides: S_A = S_B = S_AB = 0 -> ARI denominator 0
    s = spark.createDataFrame(
        [(i, i) for i in range(8)], "id long, cluster_id long"
    )
    [r2] = clustering_agreement(s, s).collect()
    assert r2.n11 == 0.0 and r2.rand_index == 1.0 and r2.adjusted_rand == 1.0


def test_clustering_agreement_never_materializes_pairs(spark):
    from datasketches_cpp_spark.operators.evaldedup import clustering_agreement

    a = spark.createDataFrame(
        [(i, 0) for i in range(1000)], "id long, cluster_id long"
    )
    b = spark.createDataFrame(
        [(i, i % 2) for i in range(1000)], "id long, cluster_id long"
    )
    df = clustering_agreement(a, b)
    [r] = df.collect()
    # one 1000-cluster = 499500 pairs, never enumerated
    assert r.pairs_total == 499500.0
    assert r.n11 + r.n10 == 499500.0  # S_A
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
