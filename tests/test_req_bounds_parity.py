"""REQ rank-confidence-bound parity against the reference
(req_sketch_impl.hpp:285-330 get_rank_lower_bound / get_rank_upper_bound):
the engine re-reads each reference-written blob and must reproduce every
bound to 1e-12 across k, hra/lra, fill levels, ranks, and num_std_dev.
"""

import json
import os

import pytest

from datasketches_cpp_spark.functions.reqserde import deserialize_req

FIXDIR = os.path.join(os.path.dirname(__file__), "golden",
                      "refgen_req_bounds")
MANIFEST = os.path.join(FIXDIR, "manifest.jsonl")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(MANIFEST), reason="req bounds fixtures not present"
)


def _rows():
    if not os.path.isfile(MANIFEST):
        return []
    with open(MANIFEST) as f:
        return [json.loads(line) for line in f]


_ROWS = _rows()


@pytest.mark.parametrize("row", _ROWS, ids=[r["file"] for r in _ROWS])
def test_rank_bounds_parity(row):
    with open(os.path.join(FIXDIR, row["file"]), "rb") as f:
        sk = deserialize_req(f.read(), item_dtype="<f4")
    assert sk.k == row["k"]
    assert sk.hra == row["hra"]
    assert sk.n == row["n"]
    for rank, sd, lb, ub in row["bounds"]:
        assert sk.get_rank_lower_bound(rank, int(sd)) == pytest.approx(
            lb, rel=1e-12, abs=1e-15)
        assert sk.get_rank_upper_bound(rank, int(sd)) == pytest.approx(
            ub, rel=1e-12, abs=1e-15)


def test_bounds_bracket_rank_and_exact_region():
    import numpy as np

    from datasketches_cpp_spark.functions.req import ReqSketch

    sk = ReqSketch(k=50, hra=True)
    sk.update_batch(np.arange(100_000, dtype=np.float64))
    for r in (0.1, 0.5, 0.9):
        assert sk.get_rank_lower_bound(r) <= r <= sk.get_rank_upper_bound(r)
    # hra: the very top ranks are exact
    assert sk.get_rank_lower_bound(0.9999) == 0.9999
    assert sk.get_rank_upper_bound(0.9999) == 0.9999
    # small stream: everything exact
    small = ReqSketch(k=50, hra=True)
    small.update_batch(np.arange(100, dtype=np.float64))
    assert small.get_rank_lower_bound(0.5) == 0.5
