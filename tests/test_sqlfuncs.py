"""SQL surface (sqlfuncs.register_sketch_sql): the Hive/Druid/PostgreSQL
integration analog — sketch functions over reference-wire blobs callable
from spark.sql. Reference parity targets: theta_sketch.hpp get_estimate /
bounds + theta set ops, hll.hpp / cpc_sketch.hpp get_estimate,
kll_sketch.hpp and tdigest.hpp get_quantile / get_rank."""

import numpy as np
import pytest

from datasketches_cpp_spark import kmv
from datasketches_cpp_spark.functions import thetaserde
from datasketches_cpp_spark.functions.kllserde import serialize_kll
from datasketches_cpp_spark.functions.quantiles import KllSketch
from datasketches_cpp_spark.functions.tdigest import TDigest
from datasketches_cpp_spark.functions.tdigestserde import serialize_tdigest
from datasketches_cpp_spark.hashing import hash63_str_many
from datasketches_cpp_spark.sqlfuncs import register_sketch_sql


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_sketch_sql(spark)
    return spark


def _theta_blob(vals) -> bytes:
    sk = kmv.from_hashes(hash63_str_many([str(v) for v in vals]))
    return thetaserde.serialize_compact_v3(sk.theta, sk.hashes)


def test_theta_sql_exact_set_algebra(sql_spark):
    """Exact-mode blobs: estimates and set ops from SQL equal true set
    algebra, bounds collapse to the estimate (theta_sketch.hpp exact mode)."""
    a = _theta_blob(range(0, 600))
    b = _theta_blob(range(300, 900))
    df = sql_spark.createDataFrame(
        [(bytearray(a), bytearray(b))], "a binary, b binary"
    )
    df.createOrReplaceTempView("theta_pair")
    row = sql_spark.sql(
        """
        select ds_theta_estimate(a)                          as est_a,
               ds_theta_estimate(ds_theta_union_pair(a, b))  as est_union,
               ds_theta_estimate(ds_theta_intersection(a, b)) as est_inter,
               ds_theta_estimate(ds_theta_a_not_b(a, b))     as est_anotb,
               ds_theta_jaccard(a, b)                        as jac,
               ds_theta_lower_bound(a, 2)                    as lb,
               ds_theta_upper_bound(a, 2)                    as ub
        from theta_pair
        """
    ).collect()[0]
    assert row.est_a == 600.0
    assert row.est_union == 900.0
    assert row.est_inter == 300.0
    assert row.est_anotb == 300.0
    assert row.jac == pytest.approx(300 / 900)
    assert row.lb == row.ub == 600.0


def test_theta_sql_grouped_union(sql_spark):
    """GROUP BY ds_theta_union over blob rows == sketch of the union set."""
    rows = [
        (1, bytearray(_theta_blob(range(0, 500)))),
        (1, bytearray(_theta_blob(range(250, 750)))),
        (2, bytearray(_theta_blob(range(0, 100)))),
    ]
    sql_spark.createDataFrame(rows, "g int, sk binary").createOrReplaceTempView(
        "theta_blobs"
    )
    got = {
        r.g: r.est
        for r in sql_spark.sql(
            "select g, ds_theta_estimate(ds_theta_union(sk)) as est "
            "from theta_blobs group by g"
        ).collect()
    }
    assert got == {1: 750.0, 2: 100.0}


def test_theta_sql_null_blob_is_nan(sql_spark):
    df = sql_spark.createDataFrame([(None,)], "sk binary")
    df.createOrReplaceTempView("theta_null")
    val = sql_spark.sql("select ds_theta_estimate(sk) as e from theta_null").collect()[
        0
    ]["e"]
    assert val is None or np.isnan(val)  # Arrow may surface NaN as SQL NULL


def test_hll_sql_estimate_from_engine_blob(sql_spark, sf_dir):
    """Engine agg → HLL_8 wire blob → SQL estimate stays inside the
    reference RSE envelope around the exact count."""
    from datasketches_cpp_spark.functions.hll import hll_sketch_agg, rse
    from datasketches_cpp_spark.functions.hllserde import with_hll_bytes

    li = sql_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lg_k = 12
    sk = hll_sketch_agg(li, [], "l_orderkey", lg_k=lg_k, keep_registers=True)
    with_hll_bytes(sk.select("regs"), lg_k).createOrReplaceTempView("hll_blob")
    est = sql_spark.sql(
        "select ds_hll_estimate(sketch_bytes) as e from hll_blob"
    ).collect()[0]["e"]
    exact = li.select("l_orderkey").distinct().count()
    assert abs(est - exact) <= 4 * rse(lg_k) * exact


def test_cpc_sql_estimate_from_engine_blob(sql_spark, sf_dir):
    from datasketches_cpp_spark.functions.cpc import cpc_sketch_agg
    from datasketches_cpp_spark.functions.cpcserde import with_cpc_bytes

    li = sql_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = cpc_sketch_agg(li, [], "l_partkey", lg_k=11)
    with_cpc_bytes(sk).createOrReplaceTempView("cpc_blob")
    est = sql_spark.sql(
        "select ds_cpc_estimate(sketch_bytes) as e from cpc_blob"
    ).collect()[0]["e"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(est - exact) <= 5 * (0.59 / np.sqrt(1 << 11)) * exact


def test_hll_cpc_sql_union_law(sql_spark, sf_dir):
    """Merge laws through the SQL surface: union of per-half blobs gives
    the SAME estimate as one blob over the whole stream — register-max
    (HLL) and matrix-OR (CPC) are exact, not approximate, laws."""
    import pyspark.sql.functions as F

    from datasketches_cpp_spark.functions.cpc import cpc_sketch_agg
    from datasketches_cpp_spark.functions.cpcserde import with_cpc_bytes
    from datasketches_cpp_spark.functions.hll import hll_sketch_agg
    from datasketches_cpp_spark.functions.hllserde import with_hll_bytes

    li = sql_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    halves = li.withColumn("h", (F.col("l_orderkey") % 2).cast("int"))

    whole_hll = hll_sketch_agg(li, [], "l_partkey", lg_k=10, keep_registers=True)
    half_hll = hll_sketch_agg(halves, ["h"], "l_partkey", lg_k=10, keep_registers=True)
    with_hll_bytes(whole_hll.select("regs"), 10).createOrReplaceTempView("hll_whole")
    with_hll_bytes(half_hll.select("regs"), 10).createOrReplaceTempView("hll_halves")
    whole_est = sql_spark.sql(
        "select ds_hll_estimate(sketch_bytes) e from hll_whole"
    ).collect()[0]["e"]
    union_est = sql_spark.sql(
        "select ds_hll_estimate(ds_hll_union(sketch_bytes)) e from hll_halves"
    ).collect()[0]["e"]
    assert union_est == pytest.approx(whole_est)

    whole_cpc = cpc_sketch_agg(li, [], "l_partkey", lg_k=10)
    half_cpc = cpc_sketch_agg(halves, ["h"], "l_partkey", lg_k=10)
    with_cpc_bytes(whole_cpc).createOrReplaceTempView("cpc_whole")
    with_cpc_bytes(half_cpc.select("lg_k", "coupons")).createOrReplaceTempView(
        "cpc_halves"
    )
    whole_est = sql_spark.sql(
        "select ds_cpc_estimate(sketch_bytes) e from cpc_whole"
    ).collect()[0]["e"]
    union_est = sql_spark.sql(
        "select ds_cpc_estimate(ds_cpc_union(sketch_bytes)) e from cpc_halves"
    ).collect()[0]["e"]
    assert union_est == pytest.approx(whole_est)


def test_kll_tdigest_sql_quantiles(sql_spark):
    """Small-n KLL blob is exact mode: SQL quantile/rank equal the true
    order statistics; t-digest rank tracks the uniform CDF."""
    xs = np.arange(1.0, 101.0)
    kll = KllSketch(k=200)
    kll.update_batch(xs)
    td = TDigest(delta=100)
    td.update_batch(xs)
    df = sql_spark.createDataFrame(
        [(bytearray(serialize_kll(kll)), bytearray(serialize_tdigest(td)))],
        "kll binary, td binary",
    )
    df.createOrReplaceTempView("q_blobs")
    row = sql_spark.sql(
        """
        select ds_kll_quantile(kll, 0.5)     as kll_med,
               ds_kll_rank(kll, 75.0)        as kll_rank,
               ds_tdigest_quantile(td, 0.5)  as td_med,
               ds_tdigest_rank(td, 75.0)     as td_rank
        from q_blobs
        """
    ).collect()[0]
    assert row.kll_med == pytest.approx(50.0, abs=1.0)
    assert row.kll_rank == pytest.approx(0.75, abs=0.01)
    assert row.td_med == pytest.approx(50.5, abs=1.5)
    assert row.td_rank == pytest.approx(0.745, abs=0.02)


def test_data2sketch_sql_aggs(sql_spark):
    """Build FROM RAW VALUES entirely in SQL (the Hive DataToSketch UDAF
    surface): theta exact below k, HLL/CPC inside their 3-sigma kappa
    bounds, KLL median exact on a small stream; per-group sketches union
    back to the global answer."""
    n = 1500
    df = sql_spark.createDataFrame(
        [(i, i % 3, float(i % 100)) for i in range(n)],
        "id long, grp int, val double",
    )
    df.createOrReplaceTempView("d2s_src")
    row = sql_spark.sql(
        "SELECT ds_theta_estimate(ds_theta_data2sketch(id)) AS th, "
        "ds_hll_estimate(ds_hll_data2sketch(id)) AS hl, "
        "ds_cpc_estimate(ds_cpc_data2sketch(id)) AS cp, "
        "ds_hll_lower_bound(ds_hll_data2sketch(id), 3) AS hl_lb, "
        "ds_hll_upper_bound(ds_hll_data2sketch(id), 3) AS hl_ub, "
        "ds_cpc_lower_bound(ds_cpc_data2sketch(id), 3) AS cp_lb, "
        "ds_cpc_upper_bound(ds_cpc_data2sketch(id), 3) AS cp_ub, "
        "ds_kll_quantile(ds_kll_data2sketch(val), 0.5) AS med "
        "FROM d2s_src"
    ).collect()[0]
    assert row["th"] == n  # exact mode below k = 4096
    assert row["hl_lb"] <= n <= row["hl_ub"]
    assert row["cp_lb"] <= n <= row["cp_ub"]
    assert abs(row["hl"] - n) / n < 0.1
    assert abs(row["cp"] - n) / n < 0.1
    # KLL k=200 over 1500 values of 0..99: median within one value
    assert abs(row["med"] - 49.5) <= 2.0
    # union of per-group sketches == global (set-algebra sanity in SQL)
    per = sql_spark.sql(
        "SELECT grp, ds_theta_data2sketch(id) sk FROM d2s_src GROUP BY grp"
    )
    per.createOrReplaceTempView("d2s_per")
    est = sql_spark.sql(
        "SELECT ds_theta_estimate(ds_theta_union(sk)) est FROM d2s_per"
    ).collect()[0]["est"]
    assert est == n


def test_data2sketch_string_and_null_inputs(sql_spark):
    """String columns hash through the engine's string law; NULLs are
    ignored like the reference UDAFs."""
    df = sql_spark.createDataFrame(
        [(f"u{i % 40}",) for i in range(200)] + [(None,)] * 5,
        "s string",
    )
    df.createOrReplaceTempView("d2s_str")
    row = sql_spark.sql(
        "SELECT ds_theta_estimate(ds_theta_data2sketch(s)) AS th FROM d2s_str"
    ).collect()[0]
    assert row["th"] == 40
