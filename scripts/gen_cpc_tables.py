"""Extract the CPC Huffman/permutation code tables into a binary resource.

Test/build tooling only — reads the PUBLIC Apache-2.0 reference header
cpc/include/compression_data.hpp (pure numeric data: the length-limited
Huffman code tables and column permutations that DEFINE the CPC wire
format; byte compatibility is impossible without these exact values) and
writes them to datasketches_cpp_spark/functions/_cpc_tables.npz.

The engine's cpcserde.py loads the .npz at import time; it never reads
the reference tree.  Re-run this script only if the wire format revs.

Usage: python scripts/gen_cpc_tables.py [reference_root]
"""

import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
SRC = os.path.join(REF, "cpc", "include", "compression_data.hpp")
DST = os.path.join(ROOT, "datasketches_cpp_spark", "functions", "_cpc_tables.npz")


def _numbers_after(text: str, decl: str, count: int) -> np.ndarray:
    i = text.index(decl)
    # strip // comments (they carry decimal annotations), then consume
    # hex/decimal literals until `count` are found (they span nested braces)
    body = re.sub(r"//[^\n]*", "", text[i + len(decl):])
    nums = []
    for m in re.finditer(r"0[xX][0-9a-fA-F]+|\d+", body):
        nums.append(int(m.group(), 0))
        if len(nums) == count:
            break
    if len(nums) != count:
        raise SystemExit(f"expected {count} numbers after {decl!r}, got {len(nums)}")
    return np.array(nums)


def _icon_polynomials(ref: str) -> np.ndarray:
    """The ICON estimator's degree-19 polynomial coefficients
    (icon_estimator.hpp ICON_POLYNOMIAL_COEFFICIENTS, lg_k 4..26 — the
    LARGER_K_VALUES rows are compiled out in the reference too). Like the
    compression tables these are accuracy-DEFINING measured constants
    with no derivation to re-do."""
    src = os.path.join(ref, "cpc", "include", "icon_estimator.hpp")
    with open(src) as f:
        text = f.read()
    start = text.index("ICON_POLYNOMIAL_COEFFICIENTS[ICON_TABLE_SIZE] = {")
    end = text.index("#ifdef LARGER_K_VALUES", start)
    body = re.sub(r"//[^\n]*", "", text[start:end])
    body = body.split("{", 1)[1]
    vals = [float(v) for v in re.findall(r"-?\d+\.?\d*(?:e[+-]?\d+)?", body)]
    arr = np.array(vals, np.float64)
    if arr.shape != (23 * 20,):
        raise SystemExit(f"expected 460 icon coefficients, got {arr.shape}")
    return arr.reshape(23, 20)


def main() -> None:
    with open(SRC) as f:
        text = f.read()
    enc = _numbers_after(
        text, "encoding_tables_for_high_entropy_byte [22][256] = {", 22 * 256
    ).astype(np.uint16).reshape(22, 256)
    unary = _numbers_after(
        text, "length_limited_unary_encoding_table65[65] = {", 65
    ).astype(np.uint16)
    perm = _numbers_after(
        text, "column_permutations_for_encoding[16][56] = {", 16 * 56
    ).astype(np.uint8).reshape(16, 56)
    icon = _icon_polynomials(REF)
    np.savez_compressed(
        DST, encoding_tables=enc, unary_table65=unary,
        column_permutations=perm, icon_poly=icon,
    )
    print(f"wrote {DST}: enc {enc.shape}, unary {unary.shape}, "
          f"perm {perm.shape}, icon {icon.shape}")


if __name__ == "__main__":
    main()
