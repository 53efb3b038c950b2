"""Flagship image+caption pipeline tests: synthetic corpus invariants
(PSNR, pHash locality), per-lane behavior, suffix array correctness, and
the golden parity gate — Spark multi-lane assignments vs the single-node
oracle at identical config (dup-pair recall ≥ 0.99, BASELINE.json)."""

import numpy as np
import pandas as pd
import pytest

from datasketches_cpp_spark.operators.imagededup import dedup_images, phash_pairs
from datasketches_cpp_spark.operators.sigkernel import SigConfig, hamming64
from datasketches_cpp_spark.operators.substring import _contains, substring_pairs, suffix_array
from datasketches_cpp_spark.oracle.pydedup import dup_pair_recall
from datasketches_cpp_spark.oracle.pyimages import oracle_dedup_images
from datasketches_cpp_spark.sources.images import (
    decode_image,
    generate_images,
    phash64,
    psnr,
)

CFG = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
BYTES_CFG = SigConfig(
    num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9
)


@pytest.fixture(scope="module")
def corpus():
    return generate_images(400, seed=42)


def test_corpus_shape_and_determinism(corpus):
    images, truth = corpus
    assert list(images.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert len(images) == 400 and len(truth) == 400
    again, _ = generate_images(400, seed=42)
    assert images["image_id"].tolist() == again["image_id"].tolist()
    assert images["bytes"].tolist() == again["bytes"].tolist()
    assert images["phash"].tolist() == again["phash"].tolist()


def test_near_pixel_psnr_invariant(corpus):
    """input_hint invariant: near-pixel dups decode within PSNR ≥ 40 dB."""
    images, truth = corpus
    merged = images.merge(truth, on="image_id")
    by_group = merged.groupby("dup_group")
    checked = 0
    for _, grp in by_group:
        if not (grp["dup_kind"] == "near_pixel").any() or len(grp) < 2:
            continue
        base = grp[grp["dup_kind"] != "near_pixel"].iloc[0]
        for _, r in grp[grp["dup_kind"] == "near_pixel"].iterrows():
            a = decode_image(base["bytes"], base["w"], base["h"], base["fmt"])
            b = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
            assert psnr(a, b) >= 40.0
            checked += 1
    assert checked > 0


def test_decode_unknown_format_raises():
    """raw/png/ppm/bmp decode for real (operators/imagecodec.py); formats
    needing codec libraries absent from this container still fail fast."""
    from datasketches_cpp_spark.operators.imagecodec import ImageCodecError

    with pytest.raises(ImageCodecError):
        decode_image(b"xx", 2, 2, "jpg")


def test_phash_locality(corpus):
    """near_pixel dups must land within the pipeline's hamming radius."""
    images, truth = corpus
    merged = images.merge(truth, on="image_id")
    checked = 0
    for _, grp in merged.groupby("dup_group"):
        if len(grp) < 2 or not (grp["dup_kind"] == "near_pixel").any():
            continue
        ph = grp["phash"].to_numpy(np.int64).astype(np.uint64)
        d = hamming64(ph[:1].repeat(len(ph) - 1), ph[1:])
        assert (d <= CFG.phash_hamming).all()
        checked += 1
    assert checked > 0


def test_suffix_array_correctness():
    toks = "b a n a n a".split()
    sa = suffix_array(toks)
    suffixes = [tuple(toks[i:]) for i in sa]
    assert suffixes == sorted(suffixes)
    assert _contains(toks, sa, ["a", "n", "a"])
    assert _contains(toks, sa, ["b", "a"])
    assert not _contains(toks, sa, ["n", "b"])
    assert not _contains(toks, sa, ["a", "a"])


def test_substring_lane(spark):
    pdf = pd.DataFrame(
        {
            "id": ["short", "long", "other", "dupshort"],
            "text": [
                "alpha beta gamma delta",
                "intro words alpha beta gamma delta trailing tail here",
                "unrelated content entirely different",
                "alpha beta gamma delta",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {(r["a"], r["b"]) for r in substring_pairs(df, "id", "text", CFG).collect()}
    # both copies of the short caption are substrings of `long`;
    # equal captions are NOT this lane's job
    assert ("long", "short") in got
    assert ("dupshort", "long") in got
    assert ("dupshort", "short") not in got


def test_phash_lane_spark(spark, corpus):
    images, truth = corpus
    df = spark.createDataFrame(images)
    got = {(r["a"], r["b"]) for r in phash_pairs(df, CFG).collect()}
    # every exact-dup pair shares identical phash → must appear
    merged = images.merge(truth, on="image_id")
    for _, grp in merged.groupby("dup_group"):
        ex = sorted(grp[grp["dup_kind"] == "exact"]["image_id"])
        if len(grp) >= 2 and len(ex) >= 1 and len(grp) <= 50:
            base = sorted(grp["image_id"])[0]
            for e in ex:
                if e != base:
                    assert (min(base, e), max(base, e)) in got


def test_images_pipeline_matches_oracle(spark, corpus):
    """THE gate: multi-lane Spark assignments vs single-node oracle at the
    identical config — dup-pair recall ≥ 0.99 (BASELINE.json)."""
    images, truth = corpus
    df = spark.createDataFrame(images).repartition(6)
    result = dedup_images(df, CFG, BYTES_CFG, byte_stride=4)
    got = {r["id"]: r["cluster_id"] for r in result["assignments"].collect()}

    oracle_assign, oracle_edges = oracle_dedup_images(
        images, CFG, BYTES_CFG, byte_stride=4
    )
    recall = dup_pair_recall(oracle_assign, got)
    assert recall >= 0.99, f"recall {recall}"
    assert got == oracle_assign


def test_images_pipeline_finds_planted_groups(spark, corpus):
    """Ground-truth check (independent of the oracle): exact and
    near-pixel duplicates must cluster with their group representative."""
    images, truth = corpus
    df = spark.createDataFrame(images).repartition(4)
    result = dedup_images(df, CFG, BYTES_CFG, byte_stride=4)
    got = {r["id"]: r["cluster_id"] for r in result["assignments"].collect()}
    merged = images.merge(truth, on="image_id")
    missed = 0
    total = 0
    for _, grp in merged.groupby("dup_group"):
        ids = grp["image_id"].tolist()
        if len(ids) < 2:
            continue
        kinds = set(grp["dup_kind"])
        if kinds & {"exact", "near_pixel", "near_caption", "substring"}:
            total += 1
            if len({got[i] for i in ids}) != 1:
                missed += 1
    assert total > 10
    assert missed / total <= 0.05, f"{missed}/{total} planted groups split"


def test_substring_verify_regimes(spark):
    """The verify kernel's two regimes (C substring-find for short hosts,
    suffix array for long multi-probe hosts) must agree with brute force."""
    import random

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(50)]
    docs = {}
    # one LONG host (> _SA_MIN_HOST_TOKENS) probed by many needles
    long_host = [rng.choice(vocab) for _ in range(5000)]
    docs[1000] = " ".join(long_host)
    for i in range(12):
        start = rng.randrange(0, 4900)
        ln = rng.randrange(4, 30)
        docs[i] = " ".join(long_host[start : start + ln])
    # short hosts with planted + non-substring needles
    docs[2000] = "alpha beta gamma delta epsilon zeta eta theta"
    docs[50] = "gamma delta epsilon"
    docs[51] = "delta gamma"  # present tokens, wrong order → NOT a substring
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "id long, text string"
    )
    got = {(r["a"], r["b"]) for r in substring_pairs(df, "id", "text", CFG).collect()}

    def brute(a_text, b_text):
        a, b = a_text.split(), b_text.split()
        if len(a) >= len(b):
            return False
        return any(b[i : i + len(a)] == a for i in range(len(b) - len(a) + 1))

    expect = set()
    ids = sorted(docs)
    for x in ids:
        for y in ids:
            if x != y and brute(docs[x], docs[y]):
                expect.add((min(x, y), max(x, y)))
    assert expect and (50, 2000) in expect and (51, 2000) not in expect
    # kernel must find every brute-force pair whose needle min-shingle
    # blocking admits (full recall here: vocab is tiny, no posting caps hit)
    assert got == expect


def test_phash_orbit_never_emits_self_pairs(spark):
    """Payload banding regression: the same id carrying two orbit pHash
    variants within the hamming radius must not pair with itself."""
    from datasketches_cpp_spark.operators.imagededup import phash_pairs
    from datasketches_cpp_spark.operators.sigkernel import SigConfig

    cfg = SigConfig()
    h = 0x0123456789ABCDEF
    df = spark.createDataFrame(
        [("x", h), ("x", h ^ 1), ("y", h ^ 3)],
        "image_id string, phash long",
    )
    pairs = phash_pairs(df, cfg).collect()
    assert all(r["a"] != r["b"] for r in pairs)
    # the real cross-id near-dup still surfaces
    assert {(r["a"], r["b"]) for r in pairs} == {("x", "y")}


def test_dedup_images_no_lanes_yields_singletons(spark):
    from datasketches_cpp_spark.operators.imagededup import dedup_images
    from datasketches_cpp_spark.sources.images import generate_images

    im, _ = generate_images(6, seed=3)
    df = spark.createDataFrame(im)
    out = dedup_images(df, enable_lanes=())
    asg = {r["id"]: r["cluster_id"] for r in out["assignments"].collect()}
    assert len(asg) == 6 and all(k == v for k, v in asg.items())
    assert out["edges"].count() == 0
