"""Iceberg source/sink: tier detection + the tested parquet-snapshot
fallback (append deltas, atomic commit log, time travel)."""

import os

import pandas as pd
import pytest

from datasketches_cpp_spark.sources.iceberg import (
    current_snapshot_id,
    expire_snapshots,
    iceberg_available,
    read_changes,
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


def _commit(spark, root, ids, mode="append"):
    return write_snapshot(
        spark.createDataFrame(pd.DataFrame({"id": ids})), root, mode
    )


def test_read_changes_incremental(spark, tmp_path):
    """Incremental (CDC) read returns exactly the rows appended in
    (from_id, to_id] — the Iceberg incremental-append-scan analog that
    feeds the streaming deduper one micro-batch per crawl commit."""
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1, 2])
    _commit(spark, root, [3, 4, 5])
    _commit(spark, root, [6])
    got = sorted(r["id"] for r in read_changes(spark, root, from_id=1).collect())
    assert got == [3, 4, 5, 6]
    got = sorted(
        r["id"] for r in read_changes(spark, root, from_id=1, to_id=2).collect()
    )
    assert got == [3, 4, 5]
    # full-history read == current table for a pure append chain
    assert sorted(r["id"] for r in read_changes(spark, root).collect()) == [
        1, 2, 3, 4, 5, 6]
    # empty range -> empty frame with the table's schema
    empty = read_changes(spark, root, from_id=3, to_id=3)
    assert empty.count() == 0 and empty.columns == ["id"]


def test_read_changes_rejects_overwrite_crossing(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1])
    _commit(spark, root, [9], mode="overwrite")
    _commit(spark, root, [10])
    with pytest.raises(ValueError, match="overwrite"):
        read_changes(spark, root, from_id=1)
    # a range strictly after the overwrite is fine
    assert [r["id"] for r in read_changes(spark, root, from_id=2).collect()] == [10]


def test_expire_snapshots_keeps_live_chains(spark, tmp_path):
    """Expiration must never break retained reads: append deltas are
    referenced by descendants' chains, so their directories survive even
    when their snapshot ids become unreadable."""
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1, 2])
    _commit(spark, root, [3])
    _commit(spark, root, [4])
    before = sorted(r["id"] for r in read_table(spark, root).collect())
    assert expire_snapshots(root, keep_last=1) == [1, 2]
    # retained read byte-identical (chain through expired ancestors)
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == before
    assert current_snapshot_id(root) == 3
    # expired ids are gone for readers, like Iceberg
    with pytest.raises(ValueError, match="expired"):
        read_table(spark, root, snapshot_id=1)
    with pytest.raises(ValueError, match="expired"):
        read_changes(spark, root, from_id=1)
    # incremental reads anchored at the retained frontier still work
    s4 = _commit(spark, root, [5])
    assert s4 == 4
    assert [r["id"] for r in read_changes(spark, root, from_id=3).collect()] == [5]
    # idempotent / nothing newly expirable
    assert expire_snapshots(root, keep_last=2) == []


def test_expire_snapshots_gc_unreferenced_dirs(spark, tmp_path):
    """An overwrite orphans its ancestors: expiring past it must delete
    the unreferenced delta directories (real GC), while the overwrite's
    own directory stays as the live root."""
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1])
    _commit(spark, root, [2])
    _commit(spark, root, [9, 10], mode="overwrite")
    _commit(spark, root, [11])
    assert expire_snapshots(root, keep_last=1) == [1, 2, 3]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("snap_"))
    # 1 and 2 unreferenced -> deleted; 3 is snapshot 4's parent -> kept
    assert dirs == ["snap_000000000003", "snap_000000000004"]
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == [9, 10, 11]


def test_expire_snapshots_collects_stale_ancestors(spark, tmp_path):
    """GC regression: a directory kept alive as a chain ancestor must be
    collectible on a LATER expire call once an overwrite cuts the chain —
    the sweep covers every expired snapshot, not just newly-expired."""
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1])
    _commit(spark, root, [2])
    # snap_1 expires but survives as snapshot 2's chain ancestor
    assert expire_snapshots(root, keep_last=1) == [1]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("snap_"))
    assert dirs == ["snap_000000000001", "snap_000000000002"]
    # an overwrite cuts the chain: nothing references snap_1 or snap_2 now
    _commit(spark, root, [9], mode="overwrite")
    assert expire_snapshots(root, keep_last=1) == [2]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("snap_"))
    assert dirs == ["snap_000000000003"]
    assert sorted(r["id"] for r in read_table(spark, root).collect()) == [9]


def test_read_changes_resumes_past_expired_from_id(spark, tmp_path):
    """CDC-after-retention regression: a consumer whose last_seen
    snapshot expired must still read the (live) delta range — the delta
    (lo, hi] never touches lo's data. Ranges CONTAINING an expired
    snapshot still raise."""
    root = str(tmp_path / "tbl")
    _commit(spark, root, [1])
    _commit(spark, root, [2])
    _commit(spark, root, [3])
    _commit(spark, root, [4])
    assert expire_snapshots(root, keep_last=2) == [1, 2]
    # last_seen == 2 (expired): delta (2, 4] is live — must succeed
    got = sorted(r["id"] for r in read_changes(spark, root, from_id=2).collect())
    assert got == [3, 4]
    # a range that CONTAINS expired snapshot 2 still raises
    with pytest.raises(ValueError, match="expired"):
        read_changes(spark, root, from_id=1)
