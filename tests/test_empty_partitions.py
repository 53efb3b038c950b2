"""Regression gate for the round-1 driver-bench killer: every sketch
family's aggregate must survive a DataFrame engineered to contain EMPTY
input partitions.

Why this matters: at sf>=0.1 a parquet file's row-group layout can leave
most scan partitions rowless (one giant row group -> one populated split).
`mapInPandas` partials that build their output frame from empty Python
lists let pandas infer float64 for array-typed columns, and pyarrow then
fails converting float64 -> list<int64> — killing the whole job.

This mirrors the reference's set-op state-matrix discipline
(theta/test/theta_setop_test.cpp:136+: {empty, exact, ...}^2 combos): the
empty state is a first-class input, not an edge case.
"""

import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.functions.bloom import bloom_filter_agg
from datasketches_cpp_spark.functions.countmin import count_min_agg
from datasketches_cpp_spark.functions.freq import frequent_items_agg
from datasketches_cpp_spark.functions.hll import hll_distinct_agg
from datasketches_cpp_spark.functions.quantiles import kll_sketch_agg
from datasketches_cpp_spark.functions.sampling import var_opt_agg
from datasketches_cpp_spark.functions.theta import theta_sketch_agg, with_estimate
from datasketches_cpp_spark.functions.tuplesketch import tuple_sketch_agg

N_PART = 16  # >> row count, so most partitions are empty


@pytest.fixture(scope="module")
def sparse_df(spark):
    # 5 rows spread over 16 partitions => >=11 guaranteed-empty partitions
    rows = [(i, f"grp{i % 2}", f"item{i}", float(i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, grp string, item string, w double")
    df = df.repartition(N_PART)
    # sanity: the fixture really does contain empty partitions
    sizes = df.rdd.glom().map(len).collect()
    assert sizes.count(0) >= N_PART - 5
    return df


def test_theta_agg_empty_partitions(sparse_df):
    out = with_estimate(theta_sketch_agg(sparse_df, ["grp"], "item")).collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    assert {r["grp"]: r["estimate"] for r in out} == {"grp0": 3.0, "grp1": 2.0}


def test_theta_agg_global_empty_partitions(sparse_df):
    out = with_estimate(theta_sketch_agg(sparse_df, [], "item")).collect()
    assert len(out) == 1 and out[0]["estimate"] == 5.0


def test_theta_agg_fully_empty_input(spark, sparse_df):
    empty = sparse_df.filter(F.lit(False)).repartition(4)
    out = theta_sketch_agg(empty, [], "item").collect()
    # zero partial rows -> zero groups (an all-empty stream has no sketch row)
    assert out == []


def test_kll_agg_empty_partitions(sparse_df):
    out = kll_sketch_agg(sparse_df, ["grp"], "w").collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    assert all(r["kll_n"] > 0 for r in out)


def test_freq_agg_empty_partitions(sparse_df):
    out = frequent_items_agg(sparse_df, ["grp"], "item").collect()
    assert len(out) == 5  # exact mode, one row per retained item
    assert all(r["offset"] == 0 for r in out)


def test_countmin_agg_empty_partitions(sparse_df):
    out = count_min_agg(sparse_df, ["grp"], "item", num_hashes=3, num_buckets=64).collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    assert sum(r["cm_total"] for r in out) == 5


def test_varopt_agg_empty_partitions(sparse_df):
    out = var_opt_agg(sparse_df, ["grp"], "item", "w", k=8).collect()
    assert len(out) == 5  # k >= n: exact mode retains every item
    assert abs(sum(r["adjusted_weight"] for r in out) - 15.0) < 1e-9


def test_tuple_agg_empty_partitions(sparse_df):
    out = tuple_sketch_agg(sparse_df, ["grp"], "item", "w", policy="sum").collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    assert sum(len(r["sig"]) for r in out) == 5


def test_bloom_agg_empty_partitions(sparse_df):
    out = bloom_filter_agg(sparse_df, "item", num_bits=1024, num_hashes=4).collect()
    assert len(out) == 1 and out[0]["n_items"] == 5


def test_hll_agg_empty_partitions(sparse_df):
    out = hll_distinct_agg(sparse_df, ["grp"], "item").collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]


def test_hll_sketch_agg_empty_partitions(sparse_df):
    from datasketches_cpp_spark.functions.hll import hll_sketch_agg

    out = hll_sketch_agg(sparse_df, ["grp"], "item", lg_k=10).collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    # tiny ndv -> linear counting is exact-ish; 3 and 2 distincts
    got = {r["grp"]: round(r["estimate"]) for r in out}
    assert got == {"grp0": 3, "grp1": 2}


def test_hll_sketch_agg_global_and_fully_empty(spark, sparse_df):
    from datasketches_cpp_spark.functions.hll import hll_sketch_agg
    import pyspark.sql.functions as F

    out = hll_sketch_agg(sparse_df, [], "item", lg_k=10).collect()
    assert len(out) == 1 and round(out[0]["estimate"]) == 5
    empty = sparse_df.filter(F.lit(False)).repartition(4)
    assert hll_sketch_agg(empty, [], "item").collect() == []


def test_classic_quantiles_agg_empty_partitions(sparse_df):
    from datasketches_cpp_spark.functions.classic_quantiles import (
        classic_quantiles_agg,
        with_classic_quantiles,
    )

    sk = classic_quantiles_agg(sparse_df, ["grp"], "w", k=4)
    out = with_classic_quantiles(sk, [0.5]).collect()
    assert sorted(r["grp"] for r in out) == ["grp0", "grp1"]
    assert all(r["cq_n"] > 0 for r in out)
