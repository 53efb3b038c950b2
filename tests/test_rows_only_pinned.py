"""VERDICT r5 item #7: the five registry queries that are rows-only by
design (no oracle SQL twin — sketch-estimate outputs) get COMMITTED value
hashes at fixed seed/config so rows-only status can never hide a silent
regression. The hash is the driver-compare hash (scripts/
check_correctness.value_hash: column-name-sorted, row-sorted, floats
rounded to 6 decimals), computed at sf0.01.

If an INTENTIONAL semantic change lands in one of these queries, update
the pinned hash in the same commit and say why in its message.
"""

from __future__ import annotations

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

PINNED = {
    "kll_quantiles": (3, "537d3a725a70a7da"),
    "ann_lsh_topk": (25, "9c01333527131d55"),
    "lsh_dedup_clusters": (500, "abeb2edf7ffb0627"),
    "minhash_signatures": (500, "9bf9d6467ea0e6bd"),
    "tdigest_price_tails": (3, "d29d7f4bd160e247"),
}


@pytest.fixture(scope="module")
def spark():
    from datasketches_cpp_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="test_pins")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.mark.parametrize("name", sorted(PINNED))
def test_rows_only_query_hash_pinned(spark, name):
    from check_correctness import value_hash

    import __spark_entry__ as entry

    df = entry.queries()[name](spark, "/root/testdata/sf0.01").toPandas()
    n_rows, want = PINNED[name]
    assert len(df) == n_rows, (name, len(df))
    assert value_hash(df) == want, (
        f"{name}: rows-only output drifted — if intentional, re-pin the "
        "hash in this file in the same commit"
    )
