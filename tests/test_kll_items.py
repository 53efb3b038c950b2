"""Generic-item (string) KLL: kernel law checks, merge associativity,
wire round-trip with the length-prefixed string serde, and the Spark
two-stage aggregate vs an exact percentile oracle."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_cpp_spark.functions.kll_items import (
    KllItemSketch,
    deserialize_kll_strings,
    kll_string_agg,
    serialize_kll_strings,
    with_string_quantiles,
)


def _words(n: int, seed: int = 3) -> list[str]:
    rng = np.random.default_rng(seed)
    return [f"w{int(x):06d}" for x in rng.integers(0, 1_000_000, n)]


def test_exact_mode_small_n():
    sk = KllItemSketch(200)
    sk.update_batch(["delta", "alpha", "echo", "bravo", "charlie"])
    assert sk.n == 5
    assert sk.min_item == "alpha" and sk.max_item == "echo"
    assert sk.get_quantile(0.5) == "charlie"  # exact below k
    assert sk.get_rank("bravo") == pytest.approx(2 / 5)
    assert sk.get_rank("aardvark") == 0.0


def test_rank_error_envelope_estimation_mode():
    """Normalized rank error of the estimated median stays within the
    published 2ε envelope on 50k lexicographically ordered words."""
    words = sorted(_words(50_000))
    sk = KllItemSketch(200)
    for i in range(0, len(words), 4096):
        sk.update_batch(words[i : i + 4096])
    assert sk.num_retained() < 3000  # genuinely sketched
    med = sk.get_quantile(0.5)
    true_rank = np.searchsorted(np.asarray(words, object), med, side="right") / len(words)
    assert abs(true_rank - 0.5) < 2 * 2.296 / (200 ** 0.9)


def test_merge_matches_single_stream():
    """Merge of per-chunk sketches must estimate like one-stream build —
    the associativity the Spark agg relies on."""
    words = _words(20_000, seed=9)
    whole = KllItemSketch(200, seed=1)
    whole.update_batch(words)
    merged = KllItemSketch(200, seed=1)
    for i in range(0, len(words), 3000):
        part = KllItemSketch(200, seed=1)
        part.update_batch(words[i : i + 3000])
        merged.merge(part)
    assert merged.n == whole.n == 20_000
    assert merged.min_item == whole.min_item
    assert merged.max_item == whole.max_item
    sw = sorted(words)
    for r in (0.1, 0.5, 0.9):
        qm = merged.get_quantile(r)
        rank = np.searchsorted(np.asarray(sw, object), qm, side="right") / len(sw)
        assert abs(rank - r) < 2 * 2.296 / (200 ** 0.9)


def test_string_wire_roundtrip():
    for n in (0, 1, 7, 5000):
        sk = KllItemSketch(200, seed=5)
        sk.update_batch(_words(n, seed=n + 1))
        buf = serialize_kll_strings(sk)
        sk2 = deserialize_kll_strings(buf)
        assert sk2.n == sk.n
        assert sk2.min_item == sk.min_item
        assert sk2.max_item == sk.max_item
        if n:
            got = sorted(np.concatenate([b for b in sk2.levels if len(b)] or [[]]))
            want = sorted(np.concatenate([b for b in sk.levels if len(b)] or [[]]))
            assert got == want
            for r in (0.25, 0.5, 0.75):
                assert sk2.get_quantile(r) == sk.get_quantile(r)


def test_string_wire_truncation_rejected():
    sk = KllItemSketch(200)
    sk.update_batch(_words(500))
    buf = serialize_kll_strings(sk)
    from datasketches_cpp_spark.functions.kll_items import KllItemSerdeError

    with pytest.raises(KllItemSerdeError):
        deserialize_kll_strings(buf[: len(buf) // 2])


def test_spark_string_agg_vs_exact(spark):
    """Two-stage Spark agg over documents.lang (small alphabet → exact
    mode per group, so estimates equal exact string percentiles)."""
    import pyspark.sql.functions as F

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("s"), F.lpad((F.col("id") % 97).cast("string"), 3, "0")).alias("s"),
    )
    sk = kll_string_agg(df, ["g"], "s", k=200)
    got = {
        r["g"]: r["quantiles"]
        for r in with_string_quantiles(sk, [0.0, 0.5]).select("g", "quantiles").collect()
    }
    import pandas as pd

    pdf = df.toPandas()
    for g, (q0, q50) in got.items():
        vals = sorted(pdf[pdf["g"] == g]["s"])
        assert q0 == vals[0]
        # exact-mode median: first item whose cumulative weight reaches n/2
        assert q50 == vals[(len(vals) - 1) // 2] or q50 == vals[len(vals) // 2]
