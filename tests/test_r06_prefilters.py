"""Round-6 optimization guards: the candidate prefilters must be pure
pruners — byte-identical query output with the pruning on or off.

* substring bloom screen (operators/substring.py): the 128-bit
  shingle-set bloom is a no-false-negative containment screen, so the
  pair set must equal brute force on an adversarial corpus where every
  doc shares the same hot min-shingle (the quadratic case it exists for).
* dedup exact-mode prefilter (operators/dedup.exact_mode_prefilter): the
  Python-broadcast prune reuses the verify kernels, so the verified pair
  set and cluster assignments must be identical with the prefilter
  disabled (threshold forced to 0).
"""

from __future__ import annotations

import pytest

import datasketches_cpp_spark.operators.dedup as D
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.operators.substring import substring_pairs


@pytest.fixture(scope="module")
def spark():
    from datasketches_cpp_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="test_r06")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _brute_substring_pairs(rows, min_tokens=3):
    out = set()
    for a_id, a_txt in rows:
        for b_id, b_txt in rows:
            if a_id == b_id:
                continue
            ta, tb = a_txt.split(), b_txt.split()
            if len(ta) < min_tokens or len(ta) >= len(tb):
                continue
            pa = " " + " ".join(ta) + " "
            pb = " " + " ".join(tb) + " "
            if pa in pb:
                out.add((min(a_id, b_id), max(a_id, b_id)))
    return sorted(out)


def test_substring_bloom_screen_keeps_all_true_pairs(spark):
    # every doc starts with the same hot bigram ("aa bb"), so every doc
    # probes the same min-shingle posting list — the quadratic blocking
    # case; planted containments at several offsets must all survive
    base = "aa bb cc dd ee ff gg hh ii jj"
    rows = [(0, base)]
    rows += [(i, f"aa bb x{i} " + base) for i in range(1, 8)]  # contain base
    rows += [(i, f"aa bb y{i} zz qq") for i in range(8, 40)]  # share min only
    rows += [(40, "cc dd ee")]  # inner substring of base, different min
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = SigConfig(num_perm=16, bands=8, kmv_k=32, shingle_w=2, jaccard_threshold=0.5)
    got = sorted(
        (r["a"], r["b"])
        for r in substring_pairs(df, "doc_id", "text", cfg, max_posting_list=4096)
        .select("a", "b")
        .collect()
    )
    assert got == _brute_substring_pairs(rows)


def test_substring_shuffle_join_path_same_pairs(spark):
    # broadcast_max_probes=0 forces the (scale) shuffled-join branch;
    # both join strategies must yield the identical pair set
    rows = [(0, "aa bb cc dd ee")] + [
        (i, f"aa bb cc dd ee pad{i} tail") for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = SigConfig(num_perm=16, bands=8, kmv_k=32, shingle_w=2, jaccard_threshold=0.5)
    bcast = sorted(
        (r["a"], r["b"])
        for r in substring_pairs(df, "doc_id", "text", cfg).select("a", "b").collect()
    )
    shuf = sorted(
        (r["a"], r["b"])
        for r in substring_pairs(
            df, "doc_id", "text", cfg, broadcast_max_probes=0
        )
        .select("a", "b")
        .collect()
    )
    assert bcast == shuf == _brute_substring_pairs(rows)


def test_substring_dense_bitmap_path_identical(spark):
    # the dense-domain bitmap candidate path (small shingle vocabulary)
    # must yield the exact pair set of the general min-shingle plan AND
    # of brute force; also exercise the fallback gates
    import datasketches_cpp_spark.operators.substring as S

    rows = [(0, "aa bb cc dd ee ff gg hh")]
    rows += [(i, f"aa bb p{i % 3} cc dd ee ff gg hh q{i % 2}") for i in range(1, 12)]
    rows += [(i, "cc dd ee ff") for i in range(12, 15)]  # identical needles
    rows += [(i, f"zz yy xx w{i}") for i in range(15, 25)]  # unrelated
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = SigConfig(num_perm=16, bands=8, kmv_k=32, shingle_w=2, jaccard_threshold=0.5)

    def run():
        return sorted(
            (r["a"], r["b"])
            for r in S.substring_pairs(df, "doc_id", "text", cfg).select("a", "b").collect()
        )

    bitmap = run()
    # force every fallback gate in turn — all must produce the same set
    for attr, val in (
        ("_BITMAP_MAX_POSTINGS", 0),
        ("_BITMAP_MAX_DOCS", 0),
        ("_BITMAP_BUDGET_BYTES", 0),
    ):
        old = getattr(S, attr)
        setattr(S, attr, val)
        try:
            assert run() == bitmap, attr
        finally:
            setattr(S, attr, old)
    assert bitmap == _brute_substring_pairs(rows)
    assert len(bitmap) > 0


def test_dedup_prefilter_identical_output(spark):
    # near-dup clusters + noise; run dedup with the prefilter active
    # (default) and disabled (threshold 0): assignments AND the verified
    # pair diagnostics must match row for row
    rows = []
    for i in range(30):
        rows.append((i, f"the quick brown fox jumps over dog number {i % 5}"))
    for i in range(30, 40):
        rows.append((i, "an entirely different sentence about ships " + "x" * (i % 3)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = SigConfig(num_perm=16, bands=8, kmv_k=32, shingle_w=2, jaccard_threshold=0.5)

    def run():
        a, v, _ = D.dedup(df, "doc_id", "text", cfg)
        return (
            sorted((r["id"], r["cluster_id"]) for r in a.collect()),
            sorted(
                (
                    r["a"],
                    r["b"],
                    r["jaccard"],
                    r["simhash_hamming"],
                    r["exact_match"],
                )
                for r in v.collect()
            ),
        )

    on_assign, on_pairs = run()
    old = D.PREFILTER_MAX_SIG_ROWS
    D.PREFILTER_MAX_SIG_ROWS = 0
    try:
        off_assign, off_pairs = run()
    finally:
        D.PREFILTER_MAX_SIG_ROWS = old
    assert on_assign == off_assign
    assert on_pairs == off_pairs
    assert len(on_pairs) > 0  # the corpus really produces verified pairs


def test_dedup_prefilter_identical_output_estimation_mode(spark):
    # kmv_k below the shingle counts forces ESTIMATION mode (theta < MAX):
    # r6 lets the decider prune these pairs with the shared verify kernel,
    # so on/off must still be byte-identical — and simhash off exercises
    # the bytes-lane shape where the kernel is the only keep criterion
    rows = []
    base = "w%d " * 30
    for i in range(24):
        rows.append((i, (base % tuple((j + i // 8) % 19 for j in range(30)))))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = SigConfig(num_perm=16, bands=8, kmv_k=8, shingle_w=2, jaccard_threshold=0.5)

    def run():
        a, v, _ = D.dedup(df, "doc_id", "text", cfg, use_simhash=False)
        return (
            sorted((r["id"], r["cluster_id"]) for r in a.collect()),
            sorted((r["a"], r["b"], r["jaccard"]) for r in v.collect()),
        )

    on_assign, on_pairs = run()
    old = D.PREFILTER_MAX_SIG_ROWS
    D.PREFILTER_MAX_SIG_ROWS = 0
    try:
        off_assign, off_pairs = run()
    finally:
        D.PREFILTER_MAX_SIG_ROWS = old
    assert on_assign == off_assign
    assert on_pairs == off_pairs
    assert len(on_pairs) > 0


def test_driver_gate_window_covers_rotated_queries():
    # the driver correctness gate samples the FIRST 50 queries() entries;
    # r6 rotated the five never-sampled queries into that window (ADVICE
    # r5: registry insertion order silently encodes gate-coverage policy
    # — pin it)
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:50])
    for q in (
        "leakage_safe_split",
        "corpus_shuffle_order",
        "kll_string_rank_coverage",
        "density_kde_coverage",
        "aod_orderkey_sums",
    ):
        assert q in window, f"{q} escaped the driver's 50-query sample window"
    assert len(names) == len(set(names))
