"""Extract the HLL composite-estimator interpolation tables into an npz.

The reference's non-HIP ("composite") HLL estimator corrects the raw
harmonic-mean estimate through cubic interpolation over an empirically
measured X table (CompositeInterpolationXTable-internal.hpp: 18 rows for
lg_k 4..21, 257 knots each, with a per-lg_k uniform Y stride).  Like the
CPC compression tables (scripts/gen_cpc_tables.py), these constants
DEFINE the estimator — they were produced by large offline simulations
and cannot be re-derived analytically — so the engine ships them as a
binary resource extracted from the reference's public Apache-2.0 header.

Run from the repo root with the read-only reference checkout present:

    python scripts/gen_hll_tables.py

writes datasketches_cpp_spark/functions/_hll_tables.npz with
  x_arr    float64 (18, 257)  — xArray rows, lg_k = 4 + row index
  y_stride float64 (18,)      — yStrides, same indexing
  coupon_x float64 (40,)      — coupon-mode estimator knots
  coupon_y float64 (40,)        (CubicInterpolation-internal.hpp:48-75,
                                 computed for coupon lgK = 26; used by
                                 LIST/SET getEstimate)
"""

from __future__ import annotations

import os
import re

import numpy as np

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
SRC = os.path.join(REF, "hll", "include",
                   "CompositeInterpolationXTable-internal.hpp")
OUT = os.path.join(os.path.dirname(__file__), os.pardir,
                   "datasketches_cpp_spark", "functions", "_hll_tables.npz")

MIN_LOG_K, MAX_LOG_K, NUM_X = 4, 21, 257


def main() -> None:
    text = open(SRC).read()

    m = re.search(r"yStrides\[\]\s*=\s*\{([^}]*)\}", text)
    y_stride = np.array([float(v) for v in m.group(1).split(",")], np.float64)
    assert y_stride.shape == (MAX_LOG_K - MIN_LOG_K + 1,), y_stride.shape

    m = re.search(r"xArray\[18\]\[numXArrValues\]\s*=\s*\{(.*?)\n\};",
                  text, re.S)
    rows = re.findall(r"\{([^{}]*)\}", m.group(1))
    assert len(rows) == 18, len(rows)
    x_arr = np.array(
        [[float(v) for v in row.replace("\n", " ").split(",") if v.strip()]
         for row in rows], np.float64)
    assert x_arr.shape == (18, NUM_X), x_arr.shape
    # each row must be strictly increasing (binary-search invariant)
    assert (np.diff(x_arr, axis=1) > 0).all()

    cubic_src = os.path.join(REF, "hll", "include",
                             "CubicInterpolation-internal.hpp")
    ctext = open(cubic_src).read()
    m = re.search(r"xArrComputed\[numEntries\]\s*=\s*\{([^}]*)\}", ctext)
    coupon_x = np.array(
        [float(v) for v in m.group(1).replace("\n", " ").split(",")
         if v.strip()], np.float64)
    m = re.search(r"yArrComputed\[numEntries\]\s*=\s*\{([^}]*)\}", ctext)
    coupon_y = np.array(
        [float(v) for v in m.group(1).replace("\n", " ").split(",")
         if v.strip()], np.float64)
    assert coupon_x.shape == coupon_y.shape == (40,)
    assert (np.diff(coupon_x) > 0).all()

    np.savez_compressed(OUT, x_arr=x_arr, y_stride=y_stride,
                        coupon_x=coupon_x, coupon_y=coupon_y)
    print(f"wrote {os.path.normpath(OUT)}  x_arr{x_arr.shape} "
          f"y_stride{y_stride.shape} coupon{coupon_x.shape}")


if __name__ == "__main__":
    main()
