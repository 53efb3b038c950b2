"""Golden-assignment gate (SURVEY.md §5, reference cross-language golden
binaries analog): a committed parquet fixture of cluster assignments at a
FIXED config (corpus seed 99, n=300; SigConfigs below). Both the
single-node oracle and the Spark pipeline must reproduce it exactly —
recall AND precision 1.0 against the frozen file.

If an intentional semantic change (hashing, shingling, banding, verify
thresholds) breaks this test, regenerate the fixture ONCE with the script
in the module docstring of tests/golden/ and say so in the commit message;
silent drift is the failure mode this guards against.
"""

import pandas as pd
import pytest

from datasketches_cpp_spark.operators.imagededup import dedup_images
from datasketches_cpp_spark.operators.sigkernel import SigConfig
from datasketches_cpp_spark.oracle.pydedup import dup_pair_recall
from datasketches_cpp_spark.oracle.pyimages import oracle_dedup_images
from datasketches_cpp_spark.sources.images import generate_images

CFG = SigConfig(num_perm=64, bands=32, kmv_k=128, shingle_w=3, jaccard_threshold=0.5)
BCFG = SigConfig(num_perm=64, bands=16, kmv_k=128, shingle_w=16, jaccard_threshold=0.9)
GOLDEN = "tests/golden/assignments_n300_s99.parquet"


@pytest.fixture(scope="module")
def golden():
    pdf = pd.read_parquet(GOLDEN)
    return dict(zip(pdf["image_id"], pdf["cluster_id"]))


def _clusters(assign: dict) -> set[frozenset]:
    by = {}
    for k, v in assign.items():
        by.setdefault(v, set()).add(k)
    return {frozenset(v) for v in by.values()}


def test_oracle_reproduces_golden(golden):
    images, _ = generate_images(300, seed=99)
    assign, _ = oracle_dedup_images(images, CFG, BCFG, byte_stride=4)
    assert _clusters(assign) == _clusters(golden)


def test_spark_reproduces_golden(spark, golden):
    images, _ = generate_images(300, seed=99)
    res = dedup_images(spark.createDataFrame(images).repartition(5), CFG, BCFG, byte_stride=4)
    got = {
        r["id"]: r["cluster_id"] for r in res["assignments"].collect()
    }
    assert _clusters(got) == _clusters(golden)
    # the BASELINE gate statistic, against the frozen assignments
    recall = dup_pair_recall(got, golden)
    assert recall >= 0.99 and recall == 1.0
