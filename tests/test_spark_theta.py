"""Spark theta aggregate tests: exact mode == COUNT(DISTINCT) (the
reference's below-k exactness, theta_sketch_test.cpp:112-141), estimation
mode within envelope, partition-layout invariance (merge law under Spark's
physical plan), and the xxhash64 JVM cross-check."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.functions.theta import (
    theta_pair_set_ops,
    theta_sketch_agg,
    theta_union_agg,
    with_bounds,
    with_estimate,
)


def test_xxhash64_matches_spark(spark):
    """Our numpy xxhash64 must agree bit-for-bit with Spark's JVM builtin —
    an external validation of the vectorized hash machinery."""
    from datasketches_cpp_spark.hashing import xxhash64_int64

    vals = list(range(-5, 5)) + [2**62, -(2**62), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select(F.xxhash64("v").alias("h")).toPandas()["h"].to_numpy()
    ours = xxhash64_int64(np.array(vals, dtype=np.int64), seed=42).astype(np.int64)
    assert np.array_equal(got, ours)


def test_exact_mode_equals_count_distinct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = theta_sketch_agg(li, [], "l_orderkey", lg_k=16)
    est = with_estimate(sk).select("estimate").collect()[0][0]
    true = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    assert est == float(true)


def test_exact_mode_strings(spark, sf_dir):
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sk = theta_sketch_agg(cu, [], "c_name", lg_k=14)
    est = with_estimate(sk).select("estimate").collect()[0][0]
    true = cu.select(F.countDistinct("c_name")).collect()[0][0]
    assert est == float(true)


def test_grouped_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sk = theta_sketch_agg(orders, ["o_orderstatus"], "o_custkey", lg_k=14)
    got = {
        r["o_orderstatus"]: r["estimate"]
        for r in with_estimate(sk).collect()
    }
    true = {
        r["o_orderstatus"]: float(r["d"])
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert got == true


def test_estimation_mode_envelope(spark):
    """n=80k distinct, lg_k=12 → estimation mode, within ±3% and inside
    2-SD bounds (reference envelope at n=8000 is 1%; we allow a bit more
    slack at 80k with k=4096 where RSE ≈ 1.6%)."""
    n = 80_000
    df = spark.range(n).select(F.col("id").alias("v"))
    sk = theta_sketch_agg(df, [], "v", lg_k=12)
    row = with_bounds(sk).collect()[0]
    assert row["theta"] > 0  # estimation mode
    assert abs(row["estimate"] - n) / n < 0.05
    assert row["lower_bound"] <= n <= row["upper_bound"]


def test_partition_layout_invariance(spark):
    """The same data in 1, 3, or 17 partitions must produce the *identical*
    sketch (theta and retained hashes) — the distributed merge-law analog of
    test_kmv.test_order_independence, and the property that makes the
    two-cluster-size scaling run return identical results."""
    n = 30_000
    base = spark.range(n).select(F.col("id").alias("v"))
    results = []
    for parts in (1, 3, 17):
        sk = theta_sketch_agg(base.repartition(parts), [], "v", lg_k=10)
        r = sk.collect()[0]
        results.append((r["theta"], tuple(r["sig"])))
    assert results[0] == results[1] == results[2]


def test_theta_union_agg_rollup(spark, sf_dir):
    """Sketch once at fine grain, roll up by merging sketches only — the
    estimate at the coarse grain must equal sketching the raw data."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fine = theta_sketch_agg(
        orders, ["o_orderstatus", "o_orderpriority"], "o_custkey", lg_k=14
    )
    rolled = theta_union_agg(fine, ["o_orderstatus"], k=1 << 14)
    direct = theta_sketch_agg(orders, ["o_orderstatus"], "o_custkey", lg_k=14)
    got = {r["o_orderstatus"]: (r["theta"], tuple(r["sig"])) for r in rolled.collect()}
    want = {r["o_orderstatus"]: (r["theta"], tuple(r["sig"])) for r in direct.collect()}
    assert got == want


def test_pair_set_ops(spark):
    a = spark.range(0, 1000).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    b = spark.range(500, 1500).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    ska = theta_sketch_agg(a, ["key"], "v", lg_k=12)
    skb = theta_sketch_agg(b, ["key"], "v", lg_k=12)
    row = theta_pair_set_ops(ska, skb, ["key"], k=1 << 12).collect()[0]
    assert row["est_a"] == 1000.0
    assert row["est_b"] == 1000.0
    assert row["est_union"] == 1500.0
    assert row["est_intersection"] == 500.0
    assert row["est_a_not_b"] == 500.0
    assert row["jaccard"] == pytest.approx(1 / 3)


def test_pair_set_ops_missing_side(spark):
    """full_outer semantics: a key present on only one side meets an
    EMPTY sketch (theta_sketch.hpp a_not_b/intersection empty-operand
    rules) — estimates degrade to the one-sided values."""
    a = spark.range(0, 300).select(F.lit("only_a").alias("key"), F.col("id").alias("v"))
    b = spark.range(0, 400).select(
        F.lit("only_b").alias("key"), (F.col("id") + 10_000).alias("v")
    )
    ska = theta_sketch_agg(a, ["key"], "v", lg_k=12)
    skb = theta_sketch_agg(b, ["key"], "v", lg_k=12)
    rows = {
        r["key"]: r
        for r in theta_pair_set_ops(ska, skb, ["key"], k=1 << 12).collect()
    }
    assert set(rows) == {"only_a", "only_b"}
    ra, rb = rows["only_a"], rows["only_b"]
    assert ra["est_a"] == 300.0 and ra["est_b"] == 0.0
    assert ra["est_union"] == 300.0 and ra["est_intersection"] == 0.0
    assert ra["est_a_not_b"] == 300.0 and ra["jaccard"] == 0.0
    assert rb["est_a"] == 0.0 and rb["est_b"] == 400.0
    assert rb["est_union"] == 400.0 and rb["est_intersection"] == 0.0
    assert rb["est_a_not_b"] == 0.0 and rb["jaccard"] == 0.0


def test_nulls_and_empties_skipped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": ["a", None, "", "b", "a"]})
    )
    sk = theta_sketch_agg(df, [], "v", lg_k=10)
    est = with_estimate(sk).collect()[0]["estimate"]
    assert est == 2.0


def test_theta_sampling_probability(spark):
    """Reference builder set_p semantics: the sketch starts at
    theta = p·2^63; estimates stay unbiased and bounds cover."""
    import pytest as _pytest

    from datasketches_cpp_spark.functions.theta import (
        theta_sketch_agg,
        with_bounds,
        with_estimate,
    )
    from datasketches_cpp_spark.kmv import MAX_THETA

    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    row = with_bounds(
        with_estimate(theta_sketch_agg(df, [], "v", lg_k=14, p=0.25)),
        num_std_devs=3,
    ).collect()[0]
    # lg_k=14 (k=16384) would be exact without p; with p=0.25 theta<=p·MAX
    assert 0 < row["theta"] <= int(0.25 * MAX_THETA)
    assert row["estimate"] == _pytest.approx(n, rel=0.05)
    assert row["lower_bound"] <= n <= row["upper_bound"]
    with _pytest.raises(ValueError, match="sampling probability"):
        theta_sketch_agg(df, [], "v", p=0.0)
