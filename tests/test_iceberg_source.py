"""Iceberg source/sink: tier detection + the tested parquet-snapshot
fallback (append deltas, atomic commit log, time travel)."""

import os

import pandas as pd
import pytest

from datasketches_cpp_spark.sources.iceberg import (
    current_snapshot_id,
    iceberg_available,
    read_table,
    snapshot_history,
    write_snapshot,
)


def test_tier_detection(spark):
    # this container ships no iceberg runtime; detection must say so
    # (on a prod cluster with the jar this flips to True and the same
    # pipeline code uses the real catalog)
    assert iceberg_available(spark) is False


def test_snapshot_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(pd.DataFrame({"id": [1, 2], "v": ["a", "b"]}))
    s1 = write_snapshot(df1, root, mode="append")
    df2 = spark.createDataFrame(pd.DataFrame({"id": [3], "v": ["c"]}))
    s2 = write_snapshot(df2, root, mode="append")
    assert (s1, s2) == (1, 2)
    assert current_snapshot_id(root) == 2
    # current = union of the delta chain
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == [1, 2, 3]
    # time travel to s1
    assert sorted(r["id"] for r in read_table(spark, root, snapshot_id=1).collect()) == [1, 2]
    hist = snapshot_history(root)
    assert [h["id"] for h in hist] == [1, 2]
    assert hist[1]["parent"] == 1


def test_snapshot_overwrite_resets_chain(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame(pd.DataFrame({"id": [1]})), root, "append")
    write_snapshot(spark.createDataFrame(pd.DataFrame({"id": [9]})), root, "overwrite")
    assert [r["id"] for r in read_table(spark, root).collect()] == [9]
    # old snapshot still readable (snapshot isolation)
    assert [r["id"] for r in read_table(spark, root, snapshot_id=1).collect()] == [1]


def test_uncommitted_snapshot_invisible(spark, tmp_path):
    """A crash between the parquet write and the log rename must leave the
    table unchanged for readers — the commit point is the log, not the
    data files (Iceberg's invariant)."""
    root = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame(pd.DataFrame({"id": [1]})), root, "append")
    # simulate the dangling dir a crash would leave
    spark.createDataFrame(pd.DataFrame({"id": [666]})).write.parquet(
        os.path.join(root, "snap_000000000099")
    )
    assert current_snapshot_id(root) == 1
    assert [r["id"] for r in read_table(spark, root).collect()] == [1]
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_table(spark, root, snapshot_id=99)
