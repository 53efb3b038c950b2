"""SQL surface: sketch functions callable from ``spark.sql``.

The reference library's users mostly consume sketches from a SQL engine
(the Apache DataSketches Hive/Druid/PostgreSQL integrations expose
``theta_sketch_union``, ``hll_sketch_get_estimate``-style functions over
binary sketch columns). This module gives the Spark engine that same
entry point over REFERENCE-WIRE blobs: every function below takes or
returns the byte layouts the serde modules read/write (theta v1-v4, HLL
LIST/SET/HLL_4/6/8, CPC family 16, KLL doubles, classic quantiles, REQ,
t-digest, frequent items, count-min, bloom, tuple AOD, var_opt), so a
table of ``.sk`` blobs written by any Java/C++ DataSketches deployment
can be queried from Spark SQL directly, and blobs this engine writes can
go the other way. Reference API parity: theta_sketch.hpp get_estimate /
get_lower_bound / get_upper_bound, theta set ops (theta_union.hpp,
theta_intersection.hpp, theta_a_not_b.hpp), hll.hpp get_estimate /
get_lower_bound / get_upper_bound, cpc_sketch.hpp get_estimate,
kll_sketch.hpp / quantiles_sketch.hpp / req_sketch.hpp / tdigest.hpp
get_quantile + get_rank (and KLL/t-digest GROUP BY merges),
frequent_items_sketch.hpp get_estimate + get_frequent_items,
count_min.hpp get_estimate, bloom_filter.hpp query,
array_of_doubles_sketch get_estimate + column sums, var_opt_sketch.hpp
get_samples (explode + WHERE + SUM(weight) in SQL is the reference's
``estimate_subset_sum(predicate)``).

Count-min and bloom point queries carry the hash-placement caveat
documented in functions/samplingserde.py: bit/bucket PLACEMENT is
implementation-defined in the reference itself (C++ stdlib RNG row
seeds), so membership/frequency queries are exact against blobs this
engine wrote, while foreign blobs round-trip value-faithfully but answer
under this engine's hash family.

Design notes, 100 TB hat on:

* All functions are Arrow-batched ``pandas_udf``s — per-batch Python,
  never per-row Spark-side.
* The scalar functions (estimate/bounds/quantile/set-op-of-two-blobs)
  stream; they add no shuffle and compose with any SQL plan.
* ``<prefix>theta_union`` is registered as a GROUPED aggregate so SQL
  users can ``GROUP BY`` over blob columns. Spark's grouped-agg pandas
  UDFs have NO map-side partial aggregation — every blob ships to its
  group's reducer. That is the right trade for union-of-sketches (the
  rows ARE tiny sketches; this is exactly what a sketch-carrying shuffle
  moves), but building sketches FROM RAW VALUES at scale should use the
  two-stage Python API (functions.theta.theta_sketch_agg et al.), which
  does partial-before-exchange — asserted in tests/test_plans.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from . import kmv
from .functions import hllserde, thetaserde
from .functions.cpcserde import deserialize_cpc
from .functions.kllserde import deserialize_kll
from .functions.tdigestserde import deserialize_tdigest

_NAN = float("nan")


def _theta_sk(b) -> "kmv.ThetaSketch":
    theta, hashes = thetaserde.deserialize_compact(bytes(b))
    # serde encodes exact mode as theta == -1; ThetaSketch uses MAX_THETA
    return kmv.ThetaSketch(1 << 16, kmv.MAX_THETA if theta < 0 else theta, hashes)


def register_sketch_sql(spark, prefix: str = "ds_") -> list[str]:
    """Register the sketch SQL functions on ``spark``; returns the list of
    registered names. Idempotent (re-registration replaces)."""

    # -- theta (blob = compact theta sketch, any serial version v1-v4) ----
    @pandas_udf("double")
    def theta_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [_NAN if b is None else _theta_sk(b).get_estimate() for b in blobs],
            dtype="float64",
        )

    @pandas_udf("double")
    def theta_lb(blobs: pd.Series, num_std: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else _theta_sk(b).get_bounds(int(s))[0]
                for b, s in zip(blobs, num_std)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def theta_ub(blobs: pd.Series, num_std: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else _theta_sk(b).get_bounds(int(s))[1]
                for b, s in zip(blobs, num_std)
            ],
            dtype="float64",
        )

    def _pairwise(op):
        def fn(a: pd.Series, b: pd.Series) -> pd.Series:
            out = []
            for x, y in zip(a, b):
                if x is None or y is None:
                    out.append(None)
                    continue
                res = op(_theta_sk(x), _theta_sk(y))
                out.append(
                    thetaserde.serialize_compact_v3(res.theta, res.hashes)
                )
            return pd.Series(out)

        return fn

    theta_union_pair = pandas_udf(
        _pairwise(lambda a, b: kmv.union([a, b])), "binary"
    )
    theta_intersect = pandas_udf(_pairwise(kmv.intersection), "binary")
    theta_a_not_b = pandas_udf(_pairwise(kmv.a_not_b), "binary")

    @pandas_udf("double")
    def theta_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN
                if x is None or y is None
                else kmv.jaccard(_theta_sk(x), _theta_sk(y))[1]
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    def _ratio(which):
        # |B|/|A| for B a theta-subset of A (reference
        # bounds_on_ratios_in_theta_sketched_sets); which: 0=lb 1=est 2=ub
        def fn(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _NAN
                    if x is None or y is None
                    else kmv.ratio_b_over_a(_theta_sk(x), _theta_sk(y))[which]
                    for x, y in zip(a, b)
                ],
                dtype="float64",
            )

        return fn

    theta_ratio_lb = pandas_udf(_ratio(0), "double")
    theta_ratio = pandas_udf(_ratio(1), "double")
    theta_ratio_ub = pandas_udf(_ratio(2), "double")

    # grouped aggregate: SELECT g, ds_theta_union(blob) FROM t GROUP BY g
    @pandas_udf("binary")
    def theta_union_agg(blobs: pd.Series) -> bytes:
        sks = [_theta_sk(b) for b in blobs if b is not None]
        if not sks:
            return thetaserde.serialize_compact_v3(kmv.MAX_THETA, np.empty(0, np.uint64))
        res = kmv.union(sks)
        return thetaserde.serialize_compact_v3(res.theta, res.hashes)

    # -- HLL (blob = any reference HLL mode: LIST/SET coupons, HLL_4/6/8) -
    @pandas_udf("double")
    def hll_estimate(blobs: pd.Series) -> pd.Series:
        from .functions.hll import _composite_estimate, coupon_estimate

        out = []
        for b in blobs:
            if b is None:
                out.append(_NAN)
                continue
            cc = hllserde.coupon_count(bytes(b))
            if cc is not None:
                # LIST/SET blob: the reference answers from the coupon count
                out.append(coupon_estimate(cc))
                continue
            hip = hllserde.hip_estimate(bytes(b))
            if hip is not None:
                out.append(hip)  # stream-written blob: reference returns HIP
            else:
                _, regs = hllserde.deserialize_hll(bytes(b))
                out.append(_composite_estimate(regs))
        return pd.Series(out, dtype="float64")

    # -- CPC (blob = family-16 compressed sketch) -------------------------
    @pandas_udf("double")
    def cpc_estimate(blobs: pd.Series) -> pd.Series:
        from .functions.cpc import invert_coupons

        out = []
        for b in blobs:
            if b is None:
                out.append(_NAN)
                continue
            d = deserialize_cpc(bytes(b))
            if d["has_hip"]:
                out.append(float(d["hip_est_accum"]))
            else:  # merged blob: ICON twin (E[C] inversion), like the reference
                out.append(invert_coupons(int(d["num_coupons"]), int(d["lg_k"])))
        return pd.Series(out, dtype="float64")

    # grouped aggregates: union of HLL / CPC blobs (mixed lg_k folds to
    # the smallest, the reference union's copy_or_downsample / reduce_k)
    @pandas_udf("binary")
    def hll_union_agg(blobs: pd.Series) -> bytes:
        from .functions.hll import fold_registers

        parsed = [hllserde.deserialize_hll(bytes(b)) for b in blobs if b is not None]
        if not parsed:
            return hllserde.serialize_hll8(np.zeros(1 << 12, np.uint8), 12)
        lg_min = min(lg for lg, _ in parsed)
        acc = np.zeros(1 << lg_min, np.uint8)
        for lg, regs in parsed:
            if lg > lg_min:
                regs = fold_registers(regs, lg - lg_min)
            np.maximum(acc, regs, out=acc)
        return hllserde.serialize_hll8(acc, lg_min)

    @pandas_udf("binary")
    def cpc_union_agg(blobs: pd.Series) -> bytes:
        from .functions.cpc import fold_matrix_k
        from .functions.cpcserde import serialize_cpc

        parsed = [deserialize_cpc(bytes(b)) for b in blobs if b is not None]
        if not parsed:
            return serialize_cpc(np.zeros(1 << 11, np.uint64), 11)
        lg_min = min(d["lg_k"] for d in parsed)
        acc = np.zeros(1 << lg_min, np.uint64)
        for d in parsed:
            m = d["matrix"]
            if d["lg_k"] > lg_min:
                m = fold_matrix_k(m, d["lg_k"] - lg_min)
            np.bitwise_or(acc, m, out=acc)
        return serialize_cpc(acc, lg_min)  # merged stream: no HIP registers

    # -- CPC bounds (cpc_confidence.hpp get_lower_bound/get_upper_bound) --
    def _cpc_bound(blobs: pd.Series, kappas: pd.Series, lower: bool) -> pd.Series:
        from .functions.cpc import (
            _HIP_HIGH_SIDE,
            _HIP_LOW_SIDE,
            _hip_rel,
            icon_bounds,
        )

        out = []
        for b, s in zip(blobs, kappas):
            if b is None:
                out.append(_NAN)
                continue
            d = deserialize_cpc(bytes(b))
            c, lg, kappa = int(d["num_coupons"]), int(d["lg_k"]), int(s)
            if not 1 <= kappa <= 3:
                # the ICON branch validates inside icon_bounds; the HIP
                # side tables would raise a raw IndexError instead
                raise ValueError(f"kappa must be between 1 and 3, got {kappa}")
            if c == 0:
                out.append(0.0)
            elif d["has_hip"]:
                # stream-written blob: HIP kappa law (the reference uses
                # the HIP interval whenever HIP registers are valid)
                est = float(d["hip_est_accum"])
                if lower:
                    v = est / (1.0 + kappa * _hip_rel(lg, kappa, _HIP_HIGH_SIDE))
                    out.append(max(v, float(c)))
                else:
                    v = est / (1.0 - kappa * _hip_rel(lg, kappa, _HIP_LOW_SIDE))
                    out.append(float(np.ceil(v)))
            else:
                lb, ub = icon_bounds(c, lg, kappa)
                out.append(lb if lower else ub)
        return pd.Series(out, dtype="float64")

    cpc_lb = pandas_udf(lambda b, s: _cpc_bound(b, s, True), "double")
    cpc_ub = pandas_udf(lambda b, s: _cpc_bound(b, s, False), "double")

    # -- data2sketch aggregates (build FROM RAW VALUES in SQL) -------------
    # The reference's SQL integrations pair every family with a
    # DataToSketch UDAF; these are that surface. NOTE: a grouped-agg
    # pandas UDF shuffles the group's raw values (no partial aggregation),
    # so these are the convenience/compat path — the DataFrame two-stage
    # aggregates (functions/*.py) are the 100 TB path. Same tradeoff the
    # reference's Hive UDAFs make.

    def _hash_series(vals: pd.Series) -> np.ndarray:
        from .hashing import hash63_int64, hash63_str_many

        vals = vals.dropna()
        if len(vals) == 0:
            return np.empty(0, np.uint64)
        if pd.api.types.is_integer_dtype(vals):
            return hash63_int64(vals.to_numpy(np.int64))
        if pd.api.types.is_float_dtype(vals):
            # A nullable BIGINT group reaches pandas as float64 (Arrow
            # null widening) — it must hash exactly like the int64
            # groups of the same column, or a later union double-counts.
            # The reference's update(double) does the same canonical-
            # ization (theta_update_sketch_base.hpp canonical_double):
            # integral doubles hash as the equal int64, non-integral
            # doubles hash their 8-byte pattern.
            v = vals.to_numpy(np.float64)
            integral = (v == np.floor(v)) & (np.abs(v) < 2**63)
            out = np.empty(len(v), np.uint64)
            if integral.any():
                out[integral] = hash63_int64(v[integral].astype(np.int64))
            if (~integral).any():
                out[~integral] = hash63_int64(v[~integral].view(np.int64))
            return out
        # strings: empty strings are no-ops, same as theta._hash_series
        strs = [s for s in vals.astype(str).tolist() if s != ""]
        return hash63_str_many(strs)

    @pandas_udf("binary")
    def theta_data2sketch(vals: pd.Series) -> bytes:
        sk = kmv.from_hashes(_hash_series(vals), 1 << kmv.DEFAULT_LG_K)
        return thetaserde.serialize_compact_v3(sk.theta, sk.hashes)

    @pandas_udf("binary")
    def hll_data2sketch(vals: pd.Series) -> bytes:
        from .functions.hll import _rho

        lg_k = 12
        h = _hash_series(vals)
        regs = np.zeros(1 << lg_k, np.uint8)
        slots = (h & np.uint64((1 << lg_k) - 1)).astype(np.int64)
        np.maximum.at(regs, slots, _rho(h, lg_k))
        return hllserde.serialize_hll8(regs, lg_k)

    @pandas_udf("binary")
    def cpc_data2sketch(vals: pd.Series) -> bytes:
        from .functions.cpc import _fold_matrix
        from .functions.cpcserde import serialize_cpc

        lg_k = 11
        mat = np.zeros(1 << lg_k, np.uint64)
        _fold_matrix(mat, _hash_series(vals), lg_k)
        return serialize_cpc(mat, lg_k)

    @pandas_udf("binary")
    def kll_data2sketch(vals: pd.Series) -> bytes:
        from .functions.kllserde import serialize_kll
        from .functions.quantiles import KllSketch

        sk = KllSketch(200)
        arr = pd.to_numeric(vals, errors="coerce").dropna().to_numpy(np.float64)
        if len(arr):
            sk.update_batch(arr)
        return serialize_kll(sk)

    # -- KLL doubles (blob = family-15 v1/v2) ------------------------------
    @pandas_udf("double")
    def kll_quantile(blobs: pd.Series, ranks: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else deserialize_kll(bytes(b)).get_quantile(float(r))
                for b, r in zip(blobs, ranks)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def kll_rank(blobs: pd.Series, items: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else deserialize_kll(bytes(b)).get_rank(float(x))
                for b, x in zip(blobs, items)
            ],
            dtype="float64",
        )

    # -- KS test over two KLL blobs (kolmogorov_smirnov.hpp:28-66) ---------
    @pandas_udf("double")
    def kll_ks_delta(a: pd.Series, b: pd.Series) -> pd.Series:
        from .functions.quantiles import ks_delta

        return pd.Series(
            [
                _NAN
                if x is None or y is None
                else ks_delta(deserialize_kll(bytes(x)), deserialize_kll(bytes(y)))
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    @pandas_udf("boolean")
    def kll_ks_test(a: pd.Series, b: pd.Series, p: pd.Series) -> pd.Series:
        from .functions.quantiles import ks_test

        return pd.Series(
            [
                None
                if x is None or y is None
                else ks_test(
                    deserialize_kll(bytes(x)), deserialize_kll(bytes(y)), float(pv)
                )
                for x, y, pv in zip(a, b, p)
            ],
            dtype="object",
        )

    # -- KLL PMF/CDF (kll_sketch.hpp:316-393 get_PMF/get_CDF; the surface
    #    the reference's Hive/Druid integrations expose as GET_PMF/GET_CDF).
    #    splits must be monotonically increasing; returns len(splits)+1
    #    masses/ranks exactly like the reference query shape. -------------
    @pandas_udf("array<double>")
    def kll_pmf(blobs: pd.Series, splits: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None or s is None
                else deserialize_kll(bytes(b))
                .get_pmf(np.asarray(s, np.float64))
                .tolist()
                for b, s in zip(blobs, splits)
            ],
            dtype="object",
        )

    @pandas_udf("array<double>")
    def kll_cdf(blobs: pd.Series, splits: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None or s is None
                else deserialize_kll(bytes(b))
                .get_cdf(np.asarray(s, np.float64))
                .tolist()
                for b, s in zip(blobs, splits)
            ],
            dtype="object",
        )

    # -- t-digest (blob = sketch type 20, incl. big-endian compat reads) --
    @pandas_udf("double")
    def tdigest_quantile(blobs: pd.Series, ranks: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN
                if b is None
                else deserialize_tdigest(bytes(b)).get_quantile(float(r))
                for b, r in zip(blobs, ranks)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def tdigest_rank(blobs: pd.Series, values: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN
                if b is None
                else deserialize_tdigest(bytes(b)).get_rank(float(v))
                for b, v in zip(blobs, values)
            ],
            dtype="float64",
        )

    # grouped aggregates: merge KLL / t-digest blobs under GROUP BY
    # (kll_sketch.hpp merge, tdigest.hpp merge — mixed-k folds to the
    # reference's merge rules, already implemented by the sketch classes)
    @pandas_udf("binary")
    def kll_merge_agg(blobs: pd.Series) -> bytes:
        from .functions.kllserde import serialize_kll

        acc = None
        for b in blobs:
            if b is None:
                continue
            sk = deserialize_kll(bytes(b))
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        if acc is None:
            from .functions.quantiles import KllSketch

            acc = KllSketch(200)
        return serialize_kll(acc)

    @pandas_udf("binary")
    def tdigest_merge_agg(blobs: pd.Series) -> bytes:
        from .functions.tdigestserde import serialize_tdigest

        acc = None
        for b in blobs:
            if b is None:
                continue
            td = deserialize_tdigest(bytes(b))
            if acc is None:
                acc = td
            else:
                acc.merge(td)
        if acc is None:
            from .functions.tdigest import TDigest

            acc = TDigest(100)
        return serialize_tdigest(acc)

    # -- HLL bounds (hll.hpp get_lower_bound/get_upper_bound) --------------
    def _hll_bound(blobs: pd.Series, num_std: pd.Series, lower: bool) -> pd.Series:
        from .functions.hll import (
            _composite_estimate,
            coupon_bounds,
            get_rel_err,
        )

        out = []
        for b, s in zip(blobs, num_std):
            if b is None:
                out.append(_NAN)
                continue
            cc = hllserde.coupon_count(bytes(b))
            if cc is not None:  # LIST/SET blob: coupon-mode bound law
                lb, ub = coupon_bounds(cc, int(s))
                out.append(lb if lower else ub)
                continue
            _, regs = hllserde.deserialize_hll(bytes(b))
            hip = hllserde.hip_estimate(bytes(b))
            est = hip if hip is not None else _composite_estimate(regs)
            lg_k = int(len(regs)).bit_length() - 1
            # a stored HIP accumulator marks a never-merged stream (the
            # writer leaves hip only when the OOO flag is clear)
            rel = get_rel_err(not lower, hip is None, lg_k, int(s))
            bound = est / (1.0 + rel)
            if lower:
                # LB >= numNonZeros (HllArray-internal.hpp:344-350)
                bound = max(bound, float(np.count_nonzero(regs)))
            out.append(bound)
        return pd.Series(out, dtype="float64")

    hll_lb = pandas_udf(lambda b, s: _hll_bound(b, s, True), "double")
    hll_ub = pandas_udf(lambda b, s: _hll_bound(b, s, False), "double")

    # -- REQ (family 17; req_sketch.hpp get_quantile/get_rank) ------------
    from .functions.reqserde import deserialize_req

    @pandas_udf("double")
    def req_quantile(blobs: pd.Series, ranks: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else deserialize_req(bytes(b)).get_quantile(float(r))
                for b, r in zip(blobs, ranks)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def req_rank(blobs: pd.Series, values: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN if b is None else deserialize_req(bytes(b)).get_rank(float(v))
                for b, v in zip(blobs, values)
            ],
            dtype="float64",
        )

    # req rank confidence bounds (req_sketch_impl.hpp:285-330)
    def _req_rank_bound(blobs, ranks, stds, lower: bool) -> pd.Series:
        out = []
        for b, r, s in zip(blobs, ranks, stds):
            if b is None:
                out.append(_NAN)
                continue
            sk = deserialize_req(bytes(b))
            out.append(
                sk.get_rank_lower_bound(float(r), int(s))
                if lower
                else sk.get_rank_upper_bound(float(r), int(s))
            )
        return pd.Series(out, dtype="float64")

    req_rank_lb = pandas_udf(
        lambda b, r, s: _req_rank_bound(b, r, s, True), "double")
    req_rank_ub = pandas_udf(
        lambda b, r, s: _req_rank_bound(b, r, s, False), "double")

    # -- classic quantiles (family 8; quantiles_sketch.hpp) ---------------
    from .functions.classicserde import deserialize_classic

    @pandas_udf("double")
    def classic_quantile(blobs: pd.Series, ranks: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN
                if b is None
                else deserialize_classic(bytes(b)).get_quantile(float(r))
                for b, r in zip(blobs, ranks)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def classic_rank(blobs: pd.Series, values: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _NAN
                if b is None
                else deserialize_classic(bytes(b)).get_rank(float(v))
                for b, v in zip(blobs, values)
            ],
            dtype="float64",
        )

    @pandas_udf("array<double>")
    def classic_pmf(blobs: pd.Series, splits: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None or s is None
                else deserialize_classic(bytes(b))
                .get_pmf(np.asarray(s, np.float64))
                .tolist()
                for b, s in zip(blobs, splits)
            ],
            dtype="object",
        )

    @pandas_udf("array<double>")
    def classic_cdf(blobs: pd.Series, splits: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None or s is None
                else deserialize_classic(bytes(b))
                .get_cdf(np.asarray(s, np.float64))
                .tolist()
                for b, s in zip(blobs, splits)
            ],
            dtype="object",
        )

    # -- frequent items (family 10, string items; frequent_items_sketch.hpp
    #    get_estimate / get_frequent_items) --------------------------------
    from .functions.fiserde import deserialize_frequent_items

    @pandas_udf("long")
    def fi_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for b, item in zip(blobs, items):
            if b is None:
                out.append(0)
                continue
            key = bytes(b)
            st = memo.get(key)
            if st is None:
                st = memo[key] = deserialize_frequent_items(key, "str")
            # reference get_estimate: stored over-estimate if tracked, else 0
            out.append(int(st.counts.get(str(item), 0)))
        return pd.Series(out, dtype="int64")

    @pandas_udf(
        "array<struct<item:string,estimate:bigint,lower_bound:bigint,"
        "upper_bound:bigint>>"
    )
    def fi_items(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(None)
                continue
            st = deserialize_frequent_items(bytes(b), "str")
            rows = sorted(
                (
                    {
                        "item": str(k),
                        "estimate": int(v),
                        "lower_bound": int(v) - st.offset,
                        "upper_bound": int(v),
                    }
                    for k, v in st.counts.items()
                ),
                key=lambda r: (-r["estimate"], r["item"]),
            )
            out.append(rows)
        return pd.Series(out)

    # -- count-min point query (family 18, string items; count_min.hpp
    #    get_estimate = min over rows) -------------------------------------
    from .functions.countmin import _row_hashes
    from .functions.samplingserde import (
        deserialize_bloom,
        deserialize_countmin,
        deserialize_varopt,
    )

    @pandas_udf("long")
    def cm_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for b, item in zip(blobs, items):
            if b is None:
                out.append(0)
                continue
            key = bytes(b)
            d = memo.get(key)
            if d is None:
                d = memo[key] = deserialize_countmin(key)
            idx = _row_hashes(
                pd.Series([str(item)]), "str", d["num_hashes"], d["num_buckets"], 9001
            )[0]
            out.append(int(d["matrix"][np.arange(d["num_hashes"]), idx].min()))
        return pd.Series(out, dtype="int64")

    # -- bloom membership (family 21, string items; bloom_filter.hpp query)
    from .functions.bloom import _bit_positions

    @pandas_udf("boolean")
    def bloom_might_contain_fn(blobs: pd.Series, items: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for b, item in zip(blobs, items):
            if b is None:
                out.append(None)
                continue
            key = bytes(b)
            d = memo.get(key)
            if d is None:
                d = memo[key] = deserialize_bloom(key)
                d["unpacked"] = np.unpackbits(d["bits"], bitorder="little")
            pos = _bit_positions(
                pd.Series([str(item)]), "str", len(d["unpacked"]),
                d["num_hashes"], d["seed"],
            )[0]
            out.append(bool(d["unpacked"][pos].all()))
        return pd.Series(out, dtype="object")

    # -- tuple AOD (family 9 type 3; array_of_doubles_sketch get_estimate +
    #    per-column population sums) ---------------------------------------
    from .functions.tupleserde import deserialize_aod

    @pandas_udf("double")
    def aod_key_estimate(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(_NAN)
                continue
            theta, keys, _, _ = deserialize_aod(bytes(b))
            t = kmv.MAX_THETA if theta < 0 else theta
            out.append(kmv.estimate(t, len(keys)))
        return pd.Series(out, dtype="float64")

    @pandas_udf("array<double>")
    def aod_column_sums(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(None)
                continue
            theta, _, vals, _ = deserialize_aod(bytes(b))
            frac = 1.0 if theta < 0 else theta / kmv.MAX_THETA
            out.append([float(x) for x in vals.sum(axis=0) / frac])
        return pd.Series(out)

    # -- var_opt samples (family 13, int64 items; var_opt_sketch.hpp
    #    get_samples — explode + WHERE + SUM(weight) in SQL gives the
    #    reference's estimate_subset_sum(predicate)) -----------------------
    @pandas_udf("array<struct<item:bigint,weight:double>>")
    def varopt_items(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(None)
                continue
            d = deserialize_varopt(bytes(b), "int64")
            out.append(
                [
                    {"item": int(i), "weight": float(w)}
                    for i, w in zip(d["items"], d["weights"])
                ]
            )
        return pd.Series(out)

    fns = {
        "theta_estimate": theta_estimate,
        "theta_lower_bound": theta_lb,
        "theta_upper_bound": theta_ub,
        "theta_union_pair": theta_union_pair,
        "theta_intersection": theta_intersect,
        "theta_a_not_b": theta_a_not_b,
        "theta_jaccard": theta_jaccard,
        "theta_ratio": theta_ratio,
        "theta_ratio_lower_bound": theta_ratio_lb,
        "theta_ratio_upper_bound": theta_ratio_ub,
        "theta_union": theta_union_agg,
        "theta_data2sketch": theta_data2sketch,
        "hll_data2sketch": hll_data2sketch,
        "cpc_data2sketch": cpc_data2sketch,
        "kll_data2sketch": kll_data2sketch,
        "hll_estimate": hll_estimate,
        "hll_lower_bound": hll_lb,
        "hll_upper_bound": hll_ub,
        "hll_union": hll_union_agg,
        "cpc_estimate": cpc_estimate,
        "cpc_lower_bound": cpc_lb,
        "cpc_upper_bound": cpc_ub,
        "cpc_union": cpc_union_agg,
        "kll_quantile": kll_quantile,
        "kll_rank": kll_rank,
        "kll_pmf": kll_pmf,
        "kll_cdf": kll_cdf,
        "kll_merge": kll_merge_agg,
        "kll_ks_delta": kll_ks_delta,
        "kll_ks_test": kll_ks_test,
        "tdigest_quantile": tdigest_quantile,
        "tdigest_rank": tdigest_rank,
        "tdigest_merge": tdigest_merge_agg,
        "req_quantile": req_quantile,
        "req_rank": req_rank,
        "req_rank_lower_bound": req_rank_lb,
        "req_rank_upper_bound": req_rank_ub,
        "classic_quantile": classic_quantile,
        "classic_rank": classic_rank,
        "classic_pmf": classic_pmf,
        "classic_cdf": classic_cdf,
        "fi_estimate": fi_estimate,
        "fi_items": fi_items,
        "cm_estimate": cm_estimate,
        "bloom_might_contain": bloom_might_contain_fn,
        "aod_key_estimate": aod_key_estimate,
        "aod_column_sums": aod_column_sums,
        "varopt_items": varopt_items,
    }
    names = []
    for name, fn in fns.items():
        spark.udf.register(prefix + name, fn)
        names.append(prefix + name)
    return names
