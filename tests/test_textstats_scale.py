"""Skew contract of exact_ngram_jaccard_pairs: one hot gram must not
produce a quadratic pair explosion (the round-1 scale-killer)."""

import pyspark.sql.functions as F

from datasketches_cpp_spark.operators.textstats import exact_ngram_jaccard_pairs


def test_hot_gram_bounded_pair_budget(spark):
    # 400 docs ALL sharing the hot bigram "xx yy"; every other gram unique.
    # J(pair) = 1 / (3 + 3 - 1) = 0.2 — every pair of docs would pass 0.15.
    docs = [(i, f"xx yy u{i} v{i}") for i in range(400)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cap = 16
    out = exact_ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.15, w=2, max_posting_list=cap
    ).collect()
    # only the cap smallest ids stay in the hot posting list -> exactly
    # C(cap, 2) pairs instead of C(400, 2) = 79800
    assert len(out) == cap * (cap - 1) // 2
    ids = {r["a"] for r in out} | {r["b"] for r in out}
    assert ids == set(range(cap))  # deterministic: smallest ids kept
    assert all(abs(r["jaccard"] - 0.2) < 1e-12 for r in out)


def test_cap_none_is_exact(spark):
    docs = [(i, f"xx yy u{i} v{i}") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = exact_ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.15, w=2, max_posting_list=None
    )
    assert out.count() == 30 * 29 // 2


def test_cap_does_not_change_discriminative_corpus(spark):
    # no gram is hotter than the cap -> capped == uncapped
    docs = [(i, f"alpha{i % 7} beta{i % 7} gamma{i % 7} delta{i}") for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = exact_ngram_jaccard_pairs(df, "doc_id", "text", 0.3, w=2, max_posting_list=64)
    exact = exact_ngram_jaccard_pairs(df, "doc_id", "text", 0.3, w=2, max_posting_list=None)
    got = {(r["a"], r["b"], round(r["jaccard"], 9)) for r in capped.collect()}
    want = {(r["a"], r["b"], round(r["jaccard"], 9)) for r in exact.collect()}
    assert got == want and len(want) > 0


def test_salted_full_hot_band_scale(spark):
    """Scale stress for hot_policy="salted_full": ONE degenerate band shared
    by 5000 ids must yield exactly C(5000,2) = 12,497,500 pairs, produced
    as ~ (5000/chunk)^2/2 bounded chunk-pair tasks — no task ever holds the
    s^2 pair set. Count-only action (the pair set never collects)."""
    import pandas as pd
    from datasketches_cpp_spark.operators.lsh import pairs_from_bands

    s = 5000
    bands = spark.createDataFrame(
        pd.DataFrame({
            "band_idx": [0] * s,
            "band_hash": [123456789] * s,
            "id": [f"d{i:06d}" for i in range(s)],
        })
    ).repartition(8)
    out = pairs_from_bands(bands, max_pairs_group=512, hot_policy="salted_full")
    assert out.count() == s * (s - 1) // 2


# ---------------------------------------------------------------------------
# Winnowing fingerprints (operators/textstats.winnow_fingerprints)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee (Schleimer et al. 2003 §2): two documents
    sharing a substring of length >= k + w - 1 share at least one selected
    fingerprint; expected density of selected positions is ~2/(w+1)."""
    import random

    from datasketches_cpp_spark.operators.textstats import winnow_fingerprints

    rng = random.Random(5)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    shared = "".join(rng.choice(alpha) for _ in range(40))  # >= k + w - 1
    docs = [
        (1, "".join(rng.choice(alpha) for _ in range(150)) + shared),
        (2, shared + "".join(rng.choice(alpha) for _ in range(150))),
        (3, "".join(rng.choice(alpha) for _ in range(300))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 40-char substring must share a fingerprint"
    # density: selected distinct fps per doc ~ 2/(w+1) of windows, loose 3x band
    n_windows = 300 - 8 + 1 - 3
    assert n_windows * 0.4 * 0.2 < len(by_doc[3]) < n_windows * 0.4 * 3.0


def test_winnow_short_docs(spark):
    from datasketches_cpp_spark.operators.textstats import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abcdefgh"), (3, None)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=8, w=4).collect()
    assert [(r.doc_id, r.fp) for r in rows] == [(2, "abcdefgh")]
