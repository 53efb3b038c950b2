"""HLL distinct counting — Spark's builtin HLL++ with the reference's
error-envelope bookkeeping.

Design decision (SURVEY.md §2A #15-18): Catalyst's `approx_count_distinct`
IS an HLL aggregate with native partial/final merge inside whole-stage
codegen — re-implementing the coupon machinery in Python would be slower
and non-mergeable by Catalyst. What the reference adds that Spark does not
expose is the error envelope; we mirror it here:

  - relative standard error ≈ 1.04/√(2^lg_k) for merged/composite
    estimates (HllUtil.hpp:85-86 COUPON_RSE_FACTOR/HLL_NON_HIP_RSE_FACTOR
    = 1.03896) — Spark's `rsd` parameter is exactly this quantity;
  - bounds at n standard deviations: est / (1 ± n·rse)
    (HllArray-internal.hpp:344-358).

`hll_distinct` therefore accepts lg_k and computes rsd = 1.03896/√2^lg_k,
keeping the reference's parameterization; bounds are JVM-side columns.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HLL_NON_HIP_RSE_FACTOR = 1.03896  # sqrt(3·ln2 − 1), HllUtil.hpp:86


def rse(lg_k: int) -> float:
    return HLL_NON_HIP_RSE_FACTOR / math.sqrt(float(1 << lg_k))


def hll_distinct_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    lg_k: int = 12,
    num_std_devs: int = 2,
) -> DataFrame:
    """groupBy(group_cols).approx_count_distinct(item) with reference-style
    (estimate, lower_bound, upper_bound) columns. Entirely JVM-side."""
    r = rse(lg_k)
    agg = F.approx_count_distinct(item_col, rsd=r).alias("estimate")
    out = df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)
    z = num_std_devs * r
    return (
        out.withColumn(
            "lower_bound", (F.col("estimate") / (1.0 + F.lit(z))).cast("double")
        ).withColumn(
            # reference bound is est / (1 - n*rse) (HllArray-internal.hpp
            # est/(1±n·rse)); est*(1+z) would be tighter than guaranteed and
            # under-cover the true cardinality.
            "upper_bound", (F.col("estimate") / (1.0 - F.lit(z))).cast("double")
        )
    )
