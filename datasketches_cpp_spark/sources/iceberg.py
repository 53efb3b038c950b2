"""Iceberg table source/sink with a tested parquet-snapshot fallback.

The north rule's input is an Iceberg table of image+caption pairs and its
checkpoints are "Iceberg snapshots". On a production cluster that means
the `iceberg-spark-runtime` jar + a catalog; this sandbox ships neither
(no jar in pyspark/jars, no network), so the module exposes ONE API with
two tested degradation tiers:

  tier 1 (prod): real Iceberg catalog — `configure_catalog()` sets the
    SQL-extension + catalog confs (the standard public recipe from the
    Iceberg docs), `read_table` uses `spark.table`/`spark.read.format
    ("iceberg")` with `snapshot-id`/`as-of-timestamp` time travel, and
    `write_snapshot` append/overwrite-by-filter commits through the
    catalog. Activated iff `iceberg_available(spark)` detects the runtime
    class on the JVM classpath.
  tier 2 (sandbox, tested here): versioned parquet snapshot directories
    `<root>/snap_<id>/` with a `_SNAPSHOTS.json` log — the same
    read-isolated, append-only snapshot semantics the pipeline needs for
    resume (plans/checkpoint.py builds on the identical idea with
    config-fingerprint manifests). Snapshot ids are monotonically
    increasing ints; `read_table(..., snapshot_id=)` time-travels.

Nothing else in the engine imports Spark's Iceberg classes directly, so
the pipeline runs identically on both tiers — the fallback is a sandbox
stand-in, not a fork.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CLASS = "org.apache.iceberg.spark.SparkSessionCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def configure_catalog(
    builder,
    catalog: str = "ds",
    warehouse: str = "/tmp/iceberg_warehouse",
):
    """Standard public Iceberg-on-Spark confs (must be set BEFORE the
    session is created). No-op cost if the jar is absent — Spark only
    resolves the classes when the catalog is first used."""
    return (
        builder.config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(f"spark.sql.catalog.{catalog}", "org.apache.iceberg.spark.SparkCatalog")
        .config(f"spark.sql.catalog.{catalog}.type", "hadoop")
        .config(f"spark.sql.catalog.{catalog}.warehouse", warehouse)
    )


# ---------------------------------------------------------------------------
# tier-2 snapshot store (sandbox fallback; same semantics, plain parquet)
# ---------------------------------------------------------------------------


def _log_path(root: str) -> str:
    return os.path.join(root, "_SNAPSHOTS.json")


def _read_log(root: str) -> dict:
    p = _log_path(root)
    if not os.path.exists(p):
        return {"snapshots": []}
    with open(p) as f:
        return json.load(f)


def _append_log(root: str, entry: dict) -> None:
    state = _read_log(root)
    state["snapshots"].append(entry)
    tmp = _log_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _log_path(root))  # atomic commit point


def current_snapshot_id(root: str) -> int | None:
    snaps = [s for s in _read_log(root)["snapshots"] if not s.get("expired")]
    return snaps[-1]["id"] if snaps else None


def snapshot_history(root: str) -> list[dict]:
    """[{id, mode, rows, parent}] — the table's commit log (the analog of
    Iceberg's snapshot metadata / `.history` metadata table)."""
    return list(_read_log(root)["snapshots"])


def write_snapshot(
    df: DataFrame,
    root: str,
    mode: str = "append",
) -> int:
    """Commit ``df`` as a new snapshot of the table at ``root``.

    mode="append": the new snapshot is the union of the previous snapshot
    and ``df`` — but stored incrementally (only the delta is written; the
    log records the parent), so an append costs O(delta), not O(table).
    mode="overwrite": the new snapshot replaces the table contents.
    Returns the new snapshot id. The `_SNAPSHOTS.json` rename is the
    atomic commit point: a crash mid-write leaves a dangling uncommitted
    directory that readers never see (Iceberg's own invariant)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(root, exist_ok=True)
    prev = current_snapshot_id(root)
    new_id = (prev or 0) + 1
    path = os.path.join(root, f"snap_{new_id:012d}")
    df.write.mode("overwrite").parquet(path)
    rows = df.sparkSession.read.parquet(path).count()
    _append_log(
        root,
        {
            "id": new_id,
            "mode": mode,
            "rows": rows,
            "parent": prev if mode == "append" else None,
        },
    )
    return new_id


def read_changes(
    spark: SparkSession,
    root: str,
    from_id: int | None = None,
    to_id: int | None = None,
) -> DataFrame:
    """Incremental (CDC-style) read: the rows APPENDED by snapshots in
    ``(from_id, to_id]`` — the fallback-tier analog of Iceberg's
    incremental append scan (`start-snapshot-id`/`end-snapshot-id` read
    options). ``from_id=None`` starts before the first snapshot;
    ``to_id=None`` ends at the current one. This is the natural feed for
    the streaming deduper in the crawl regime: each new crawl commit is
    a snapshot, and `read_changes(root, last_seen, None)` is exactly the
    micro-batch to hand `IncrementalDeduper.process_batch`.

    Raises ValueError if the range crosses an overwrite snapshot —
    deltas across a table replacement are not well-defined, the same
    restriction Iceberg's incremental scan enforces (it rejects ranges
    containing REPLACE/OVERWRITE snapshots) — or an expired one."""
    snaps = {s["id"]: s for s in _read_log(root)["snapshots"]}
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    live = {i for i, s in snaps.items() if not s.get("expired")}
    hi = to_id if to_id is not None else (max(live) if live else max(snaps))
    if hi not in snaps:
        raise ValueError(f"unknown snapshot id {hi}; have {sorted(snaps)}")
    lo = from_id if from_id is not None else 0
    if lo and lo not in snaps:
        raise ValueError(f"unknown snapshot id {lo}; have {sorted(snaps)}")
    picked = [s for i, s in sorted(snaps.items()) if lo < i <= hi]
    gone = [s["id"] for s in picked if s.get("expired")]
    if gone:
        raise ValueError(
            f"incremental read range ({lo}, {hi}] touches expired "
            f"snapshot(s) {gone}"
        )
    # lo itself MAY be expired: the delta (lo, hi] never reads lo's data
    # — a consumer whose last_seen fell behind a retention pass must
    # still resume (the docstring's prescribed crawl feed), exactly like
    # Iceberg, whose incremental scan only requires the range's own
    # snapshots to be readable.
    bad = [s["id"] for s in picked if s["mode"] != "append"]
    if bad:
        raise ValueError(
            f"incremental read range ({lo}, {hi}] crosses overwrite "
            f"snapshot(s) {bad}; deltas across a table replacement are "
            "undefined — read_table the endpoint instead"
        )
    if not picked:
        schema = read_table(spark, root, snapshot_id=hi).schema
        return spark.createDataFrame([], schema)
    df = None
    for s in picked:
        part = spark.read.parquet(os.path.join(root, f"snap_{s['id']:012d}"))
        df = part if df is None else df.unionByName(part)
    return df


def expire_snapshots(root: str, keep_last: int = 1) -> list[int]:
    """Retention maintenance — the fallback-tier analog of Iceberg's
    `expireSnapshots`: drop all but the last ``keep_last`` snapshots from
    the log and delete data directories no retained snapshot references.
    Because append snapshots store only their delta, a retained
    snapshot's read chain may run through expired ancestors — those
    directories are REFERENCED and must survive (their log entries stay,
    flagged ``expired``, so chain metadata survives too); only
    directories reachable from no retained snapshot are removed. Returns
    the newly expired snapshot ids. Time-traveling to an expired id
    subsequently raises (Iceberg's behavior); retained reads are
    byte-identical."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    state = _read_log(root)
    snaps = sorted(state["snapshots"], key=lambda s: s["id"])
    by_id = {s["id"]: s for s in snaps}
    live = [s for s in snaps if not s.get("expired")]
    if len(live) <= keep_last:
        return []
    retained = live[-keep_last:]
    live_dirs: set[int] = set()
    for s in retained:
        cur: int | None = s["id"]
        while cur is not None:
            live_dirs.add(cur)
            cur = by_id[cur]["parent"]
    newly_expired = [s["id"] for s in live[:-keep_last]]
    for s in snaps:
        if s["id"] not in {r["id"] for r in retained}:
            s["expired"] = True
    tmp = _log_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshots": snaps}, f)
    os.replace(tmp, _log_path(root))  # commit point: log first, then GC
    # GC sweeps EVERY expired snapshot, not just newly-expired ones: a
    # directory kept alive earlier as a chain ancestor loses its last
    # reference when a later overwrite cuts the chain — it must be
    # collectible on the next expire call, or it leaks forever.
    for s in snaps:
        if s.get("expired") and s["id"] not in live_dirs:
            shutil.rmtree(
                os.path.join(root, f"snap_{s['id']:012d}"), ignore_errors=True
            )
    return newly_expired


def read_table(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the table as of ``snapshot_id`` (default: current). An
    append-mode snapshot resolves to the union of its delta chain —
    Iceberg time travel over the fallback store. Expired snapshots
    (``expire_snapshots``) are no longer readable, matching Iceberg."""
    snaps = {s["id"]: s for s in _read_log(root)["snapshots"]}
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {root}")
    live = {i for i, s in snaps.items() if not s.get("expired")}
    sid = snapshot_id if snapshot_id is not None else max(live)
    if sid not in snaps:
        raise ValueError(f"unknown snapshot id {sid}; have {sorted(snaps)}")
    if snaps[sid].get("expired"):
        raise ValueError(f"snapshot {sid} is expired; live ids: {sorted(live)}")
    chain = []
    cur: int | None = sid
    while cur is not None:
        chain.append(cur)
        cur = snaps[cur]["parent"]
    df = None
    for s in chain:
        part = spark.read.parquet(os.path.join(root, f"snap_{s:012d}"))
        df = part if df is None else df.unionByName(part)
    return df
