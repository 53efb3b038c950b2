"""Tiered dedup cascade (operators/tiered.py).

Pins the planted-truth clustering, the lossless-collapse equivalence
against a flat dedup_images run, bloom-vs-semi survivor-filter
identity, the semantic tier's merge behavior, and the length-framed
exact-key non-collision.
"""

import numpy as np
import pytest

from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.operators.tiered import tiered_dedup_images
from datasketches_cpp_spark.sources.images import generate_images, phash64

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _planted_rows():
    """8 bases; per base: original + 2 byte+caption exact dups + 1
    near-pixel copy (fresh caption), plus 6 uniques. Truth = min id."""
    rows, truth = [], {}
    for i in range(8):
        r = np.random.default_rng(5200 + i)
        px = r.integers(0, 256, 32 * 32 * 3, dtype=np.int64).astype(np.uint8)
        cap = f"tiered base caption {i}"
        base = f"td{i:02d}a"
        ph = int(np.int64(np.uint64(phash64(px, 32, 32))))
        for j in range(3):  # original + two exact dups
            iid = f"td{i:02d}{chr(ord('a') + j)}"
            rows.append((iid, bytearray(px.tobytes()), 32, 32, "raw", cap, ph))
            truth[iid] = base
        noisy = np.clip(
            px.astype(np.int16) + r.integers(-2, 3, px.shape), 0, 255
        ).astype(np.uint8)
        nid = f"td{i:02d}d"
        nph = int(np.int64(np.uint64(phash64(noisy, 32, 32))))
        rows.append(
            (nid, bytearray(noisy.tobytes()), 32, 32, "raw",
             f"different caption {i}", nph)
        )
        truth[nid] = base
    for i in range(6):
        r = np.random.default_rng(5400 + i)
        px = r.integers(0, 256, 32 * 32 * 3, dtype=np.int64).astype(np.uint8)
        iid = f"tu{i:02d}"
        rows.append(
            (iid, bytearray(px.tobytes()), 32, 32, "raw",
             f"unique caption {i}", int(np.int64(np.uint64(phash64(px, 32, 32)))))
        )
        truth[iid] = iid
    return rows, truth


@pytest.mark.parametrize("survivor_filter", ["bloom", "semi"])
def test_planted_cascade(spark, survivor_filter):
    rows, truth = _planted_rows()
    images = spark.createDataFrame(rows, SCHEMA)
    res = tiered_dedup_images(
        images, SigConfig(), survivor_filter=survivor_filter
    )
    got = {r["id"]: r["cluster_id"]
           for r in res["assignments"].collect()}
    assert got == truth
    stats = {r["tier"]: (r["input_rows"], r["survivors"])
             for r in res["tier_stats"].collect()}
    # exact tier: 38 rows in, 8*2+6 = 22 distinct content keys out
    assert stats["exact"] == (38, 22)
    # near tier: bloom may admit a few byte-twins; semi is exactly 22
    assert stats["near"][0] >= 22
    if survivor_filter == "semi":
        assert stats["near"][0] == 22
    assert stats["near"][1] == 14  # 8 clusters + 6 uniques


def test_equivalence_with_flat_run(spark):
    """Lossless-collapse law: the cascade equals a flat dedup_images run
    over everything (content lanes; exact key covers bytes+caption)."""
    from datasketches_cpp_spark.operators.imagededup import dedup_images

    pdf, _ = generate_images(300, seed=41)
    images = spark.createDataFrame(pdf)
    flat = {
        r["id"]: r["cluster_id"]
        for r in dedup_images(
            images, SigConfig(), enable_lanes=("bytes", "phash")
        )["assignments"].collect()
    }
    for filt in ("bloom", "semi"):
        tiered = {
            r["id"]: r["cluster_id"]
            for r in tiered_dedup_images(
                images, SigConfig(), survivor_filter=filt
            )["assignments"].collect()
        }
        assert tiered == flat, f"cascade != flat under {filt}"


def test_semantic_tier_merges_near_reps(spark):
    """Two near-tier clusters whose representatives share an embedding
    direction merge in the semantic tier; unrelated ones do not."""
    rows, _ = _planted_rows()
    images = spark.createDataFrame(rows, SCHEMA)
    # embeddings: bases 0 and 1 point the same way, everything else
    # orthogonal-ish (distinct axes)
    emb_rows = []
    axis = {}
    for i, (iid, *_rest) in enumerate(rows):
        base = iid[:4]
        if base not in axis:
            axis[base] = len(axis)
        vec = [0.0] * 40
        if iid.startswith(("td00", "td01")):
            vec[0] = 1.0
        else:
            vec[2 + axis[base]] = 1.0
        emb_rows.append((iid, vec))
    emb = spark.createDataFrame(emb_rows, "image_id string, embedding array<double>")
    res = tiered_dedup_images(
        images, SigConfig(), embeddings=emb, semantic_threshold=0.95,
        n_centroids=4,
    )
    got = {r["id"]: r["cluster_id"]
           for r in res["assignments"].collect()}
    # base 0 and base 1 collapse to one cluster (min id td00a)
    for iid in ("td00a", "td00d", "td01a", "td01c", "td01d"):
        assert got[iid] == "td00a"
    # base 2 stays its own cluster
    assert got["td02a"] == "td02a" and got["td02d"] == "td02a"
    stats = {r["tier"]: (r["input_rows"], r["survivors"])
             for r in res["tier_stats"].collect()}
    assert stats["semantic"] == (14, 13)  # 14 near reps -> 13 semantic


def test_exact_key_length_framing(spark):
    """("ab", "c") and ("a", "bc") must not share an exact key."""
    rows = [
        ("k0", bytearray(b"ab"), 1, 1, "raw", "c", 0),
        ("k1", bytearray(b"a"), 1, 1, "raw", "bc", 0),
    ]
    images = spark.createDataFrame(rows, SCHEMA)
    a1 = tiered_dedup_images(
        images, SigConfig(), near_lanes=("bytes",), survivor_filter="semi"
    )["exact_assignments"]
    reps = {r["image_id"]: r["rep1"] for r in a1.collect()}
    assert reps == {"k0": "k0", "k1": "k1"}


def test_errors(spark):
    rows, _ = _planted_rows()
    images = spark.createDataFrame(rows[:4], SCHEMA)
    with pytest.raises(ValueError, match="survivor_filter"):
        tiered_dedup_images(images, survivor_filter="exactly")
    with pytest.raises(ValueError, match="exact_on"):
        tiered_dedup_images(images, exact_on=("bytes", "nope"))


def test_plan_tiers_exact_mode(spark):
    """<= 2^lg_k distinct keys keeps the planning sketch in exact mode:
    every column is exact and the recommendation follows the true
    duplication ratio (38 rows, 22 distinct => ratio 16/38)."""
    from datasketches_cpp_spark.operators.tiered import plan_tiers

    rows, _ = _planted_rows()
    images = spark.createDataFrame(rows, SCHEMA)
    got = plan_tiers(images, lg_k=12, min_dup_ratio=0.05).collect()[0]
    assert got["total_rows"] == 38
    assert got["distinct_est"] == got["distinct_lb"] == got["distinct_ub"] == 22.0
    truth = 1.0 - 22.0 / 38.0
    assert abs(got["dup_ratio_est"] - truth) < 1e-12
    assert got["dup_ratio_lb"] == got["dup_ratio_ub"] == got["dup_ratio_est"]
    assert got["exact_tier"] is True

    # all-unique corpus: ratio exactly 0, tier not recommended
    uniq = spark.createDataFrame(
        [(r[0], r[1], 32, 32, "raw", f"only {i}", r[6])
         for i, r in enumerate(rows[:10])], SCHEMA)
    got = plan_tiers(uniq, exact_on=("caption",), lg_k=12).collect()[0]
    assert got["dup_ratio_est"] == 0.0 and got["exact_tier"] is False


def test_plan_tiers_estimation_mode_bounds_cover_truth(spark):
    """Estimation mode (lg_k=5, 600 distinct keys, true dup ratio 0.7):
    the binomial bounds bracket the truth and the conservative
    recommendation (lower bound >= threshold) still fires."""
    from datasketches_cpp_spark.operators.tiered import plan_tiers

    rows = []
    for i in range(2000):
        key = i % 600  # 600 distinct captions, 2000 rows
        rows.append((f"e{i:05d}", bytearray(b"x"), 1, 1, "raw",
                     f"estimation caption {key}", 0))
    images = spark.createDataFrame(rows, SCHEMA)
    got = plan_tiers(images, exact_on=("caption",), lg_k=5,
                     min_dup_ratio=0.05).collect()[0]
    truth = 1.0 - 600.0 / 2000.0
    assert got["distinct_lb"] <= 600.0 <= got["distinct_ub"]
    assert got["dup_ratio_lb"] <= truth <= got["dup_ratio_ub"]
    assert got["dup_ratio_lb"] < got["dup_ratio_est"] < got["dup_ratio_ub"]
    assert got["exact_tier"] is True


def test_auto_plan_skips_or_runs_exact_tier(spark):
    """auto_plan consumes the sketch plan: dup-heavy corpus => exact
    tier runs (plan recorded, clustering equals the unplanned cascade);
    all-unique corpus => exact tier skipped (identity exact map, exact
    funnel row (n, n)) with the same clustering as a flat run."""
    rows, truth = _planted_rows()
    images = spark.createDataFrame(rows, SCHEMA)
    auto = tiered_dedup_images(images, SigConfig(), auto_plan=True)
    assert auto["plan"]["exact_tier"] is True
    got = {r["id"]: r["cluster_id"] for r in auto["assignments"].collect()}
    assert got == truth

    uniq_rows = [
        (r[0], r[1], 32, 32, "raw", f"auto unique {i}", r[6])
        for i, r in enumerate(rows)
        if r[0] == f"td{int(r[0][2:4]):02d}a" or r[0].startswith("tu")
    ]
    uniq = spark.createDataFrame(uniq_rows, SCHEMA)
    auto_u = tiered_dedup_images(uniq, SigConfig(), auto_plan=True)
    assert auto_u["plan"]["exact_tier"] is False
    n = len(uniq_rows)
    stats = {r["tier"]: (r["input_rows"], r["survivors"])
             for r in auto_u["tier_stats"].collect()}
    assert stats["exact"] == (n, n)  # identity map: nothing collapsed
    # identity exact map => every id is its own rep
    a1 = auto_u["exact_assignments"]
    assert a1.where("image_id != rep1").count() == 0
    # same clustering as the always-exact cascade (collapse lossless)
    plain = {
        r["id"]: r["cluster_id"]
        for r in tiered_dedup_images(uniq, SigConfig())["assignments"].collect()
    }
    got_u = {r["id"]: r["cluster_id"]
             for r in auto_u["assignments"].collect()}
    assert got_u == plain


def test_dup_ratio_by_group_exact_mode(spark):
    """Grouped duplication diagnostics: per-group exact-mode columns
    follow the planted per-source duplication exactly."""
    from datasketches_cpp_spark.operators.tiered import dup_ratio_by_group

    rows = []
    px = b"\x01" * 48
    for i in range(12):  # srcA: 12 rows, 4 distinct captions
        rows.append((f"a{i:02d}", bytearray(px), 4, 4, "raw",
                     f"dup cap {i % 4}", 0, "srcA"))
    for i in range(8):   # srcB: 8 rows, all distinct
        rows.append((f"b{i:02d}", bytearray(px), 4, 4, "raw",
                     f"uniq cap {i}", 0, "srcB"))
    images = spark.createDataFrame(rows, SCHEMA + ", source string")
    got = {
        r["source"]: r
        for r in dup_ratio_by_group(
            images, ["source"], exact_on=("caption",)
        ).collect()
    }
    a, b = got["srcA"], got["srcB"]
    assert a["total_rows"] == 12 and a["distinct_est"] == 4.0
    assert abs(a["dup_ratio_est"] - (1 - 4 / 12)) < 1e-12
    assert a["dup_ratio_lb"] == a["dup_ratio_ub"] == a["dup_ratio_est"]
    assert b["total_rows"] == 8 and b["distinct_est"] == 8.0
    assert b["dup_ratio_est"] == 0.0


def test_exact_key_null_handling(spark):
    """NULL exact_on parts must not null-propagate into the key (NULL
    keys would lump unrelated fetch-failure rows into one window
    partition): the key is never NULL, NULLs compare equal to each
    other (GROUP BY law), and NULL != empty."""
    from datasketches_cpp_spark.operators.tiered import _exact_key

    rows = [
        ("n0", None, 1, 1, "raw", "cap A", 0),
        ("n1", None, 1, 1, "raw", "cap B", 0),
        ("n2", None, 1, 1, "raw", "cap A", 0),
        ("n3", bytearray(b""), 1, 1, "raw", "cap A", 0),
        ("n4", bytearray(b"x"), 1, 1, "raw", None, 0),
        ("n5", bytearray(b"x"), 1, 1, "raw", "", 0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    keys = {
        r["image_id"]: r["k"]
        for r in df.select(
            "image_id", _exact_key(df, ("bytes", "caption")).alias("k")
        ).collect()
    }
    assert all(v is not None for v in keys.values())
    assert keys["n0"] != keys["n1"]   # different captions never lump
    assert keys["n0"] == keys["n2"]   # NULL == NULL per part
    assert keys["n0"] != keys["n3"]   # NULL bytes != empty bytes
    assert keys["n4"] != keys["n5"]   # NULL caption != empty caption


def test_plan_tiers_empty_corpus_one_row(spark):
    from datasketches_cpp_spark.operators.tiered import plan_tiers

    empty = spark.createDataFrame(
        [], "image_id string, bytes binary, caption string"
    )
    rows = plan_tiers(empty).collect()
    assert len(rows) == 1
    assert rows[0]["total_rows"] == 0 and rows[0]["exact_tier"] is False
