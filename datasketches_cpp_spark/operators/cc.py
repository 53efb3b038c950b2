"""S8: connected components via alternating large-star / small-star.

Pure DataFrame algebra (the published two-phase min-label algorithm from
"Connected Components in MapReduce and Beyond" — O(log n) rounds even on
adversarial chains, unlike naive label propagation which needs O(diameter)).
The iterative min-merge is the graph analog of the reference's min-theta
union (theta_union_base_impl.hpp:38-59): associative + idempotent, so
partial results merge in any order — which is why each round is just an
aggregate + a join, no per-node state.

Each round is implemented as `groupBy().agg(min)` + join — deliberately NOT
`collect_list` of neighbors, so a hub with 10^8 neighbors never materializes
an array; the shuffle stays row-shaped and AQE's skew handling applies.
Per-round `localCheckpoint` truncates lineage (Catalyst has no fixpoint
operator; unbounded lineage would blow up planning at high iteration
counts). Convergence is detected with a commutative checksum aggregate
(count + sum of xxhash64), not a full diff.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: diagnostics from the most recent connected_components() run on this
#: driver: {"rounds": int, "checksums": [(round, seconds)], "init_sec": s}
LAST_STATS: dict = {}


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (a < b), self-loops dropped, deduped."""
    return (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(neighbors ∪ {u}); connect every *larger*
    neighbor v to m. Detaches big nodes from each other, pointing them at
    small labels."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
    mins = mins.select(F.col("a").alias("u"), F.least("mn", F.col("a")).alias("m"))
    out = (
        sym.join(mins, sym["a"] == mins["u"])
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return _canonical(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; for each node u: m = min smaller neighbor;
    connect u and all its smaller neighbors to m. Flattens chains into
    stars."""
    oriented = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    rewired = oriented.join(mins, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    self_edges = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canonical(rewired.union(self_edges))


def _checksum(edges: DataFrame) -> tuple[int, str]:
    """(edge count, commutative content checksum) of the edge set — the
    checksum is the shared plans.checkpoint.checksum (count + decimal
    xxhash64 sum), so the convergence test and the resume-identity
    assertions use ONE definition."""
    from ..plans.checkpoint import checksum

    sig = checksum(edges, "a", "b")
    return int(sig.split(":", 1)[0]), sig


def _driver_min_label(pdf) -> "DataFrame":
    """Exact connected components of a SMALL edge list on the driver:
    vectorized hash-min label propagation + pointer jumping (numpy, no
    Python-level loop over edges). Returns a pandas DataFrame
    (id, cluster_id) covering every node in the edge list, cluster_id =
    component minimum — identical semantics to the distributed fixpoint."""
    import numpy as np
    import pandas as pd

    a = pdf["a"].to_numpy()
    b = pdf["b"].to_numpy()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        # edge relax: both endpoints take the min of their labels
        mn = np.minimum(label[u], label[v])
        before = label.copy()
        np.minimum.at(label, u, mn)
        np.minimum.at(label, v, mn)
        # pointer jumping: label(x) <- label(label(x)) to fixpoint
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return pd.DataFrame({"id": nodes, "cluster_id": nodes[label]})


def connected_components(
    edges: DataFrame,
    max_iter: int = 40,
    min_rounds: int = 3,
    check_every: int = 1,
    driver_finish_edges: int = 8_000_000,
) -> DataFrame:
    """Edge list (a, b) → assignments (id, cluster_id) where cluster_id is
    the component's minimum node id. Nodes absent from the edge list are
    the caller's to add back (singletons keep their own id).

    Two regimes, switched on the LIVE edge count (known at every checksum
    barrier, so the switch costs nothing extra):

    * **distributed star rounds** while |E| > ``driver_finish_edges`` —
      each round shrinks the graph geometrically; rounds are EAGERLY
      localCheckpointed (each round's plan references ``cur`` ~5×, so a
      lazy checkpoint lets the *analyzed* tree grow ~5^r between
      materializations — measured ~18 s of single-threaded driver/Catalyst
      time at 10^6 images, Amdahl serial cost that scales with nothing);
    * **driver finish** once |E| fits the threshold (default 8M edges ≈
      128 MB) — collect + vectorized numpy min-label propagation. The
      threshold is profile-tuned, not guessed: at 21.2M edges on local[32]
      (scripts/profile_cc.py, round 5) the numpy finish took 42 s while
      EACH distributed star round cost 20-50 s — so any edge set the
      driver can safely hold is cheaper to finish there than to run even
      one more distributed round over. 8M rows of two longs is a bounded
      ~128 MB pandas frame; raise it on a fat driver. The same
      bounded-driver-work discipline as IVF coarse-quantizer training: a
      sub-second exact computation on one box replaces O(log n) cluster-
      wide barrier rounds of ~2 s fixed overhead each. On a 10^12-image
      run the first rounds run distributed and the tail still finishes on
      the driver; the result is bit-identical either way (both compute
      component-min labels), which tests/test_dedup_pipeline.py asserts.

    Convergence of the distributed regime is detected with the commutative
    checksum every ``check_every`` rounds after ``min_rounds``. The default
    is now EVERY round: profiled runs (scripts/profile_cc.py, local[32],
    round 5) measured the checksum barrier at 0.12-0.19 s vs 4-15 s per
    star round at 5.3M edges, and 3-6 s vs 20-50 s at 21.2M — one agg
    over the already-checkpointed frame, ~2-15% of a round — while a
    skipped check costs a full wasted round once the fixpoint is reached
    AND delays the size-triggered handoff to the driver finish. Both
    costs scale with |E|, so the ratio holds at cluster scale.

    The regime choice itself costs ONE action, not three: a
    ``limit(threshold+1).toPandas()`` probe. If at most ``threshold``
    canonical edges come back they ARE the whole graph — driver finish
    proceeds on them directly, with no checkpoint or checksum job ever
    scheduled. Only a genuinely giant graph pays for the distributed
    regime's materialization barriers. (At small corpus sizes each Spark
    job is ~fixed-cost in multi-executor mode; this fusion removes two of
    the flagship's serial barriers — Amdahl terms the N→4N scaling gate
    measures directly.)"""
    t_init = time.time()
    LAST_STATS.clear()
    LAST_STATS.update({"rounds": 0, "checksums": []})
    cur = _canonical(edges)
    # The probe uses Spark's DEFAULT incremental CollectLimit (1 partition,
    # then 4× more per batch). The escalation batches are cheap: the
    # expensive upstream (signature/verify lanes + the distinct's map side)
    # runs once and its shuffle files are reused, so each batch is a
    # reduce-only job over already-shuffled rows. The alternative — forcing
    # one pass over all partitions via spark.sql.limit.initialNumPartitions
    # — is a driver-OOM hazard at scale: every task in that single batch
    # may ship up to `limit` rows, so P partitions × 2M-edge threshold can
    # land P× the threshold on the driver at once. A few reduce-only serial
    # jobs are the safer trade on both regimes.
    probe = cur.limit(driver_finish_edges + 1).toPandas()
    LAST_STATS["init_sec"] = round(time.time() - t_init, 2)
    if len(probe) == 0:
        return edges.sparkSession.createDataFrame(
            [], schema=edges.select(
                edges["a"].alias("id"), edges["b"].alias("cluster_id")
            ).schema,
        )

    def _finish_on_driver(pdf) -> DataFrame:
        t_d = time.time()
        comp = _driver_min_label(pdf)
        out = edges.sparkSession.createDataFrame(comp)
        LAST_STATS["driver_finish_sec"] = round(time.time() - t_d, 2)
        return out

    if len(probe) <= driver_finish_edges:
        return _finish_on_driver(probe)

    # giant graph: distributed star rounds need the lineage barrier + a
    # baseline checksum for convergence detection
    del probe
    cur = cur.localCheckpoint(eager=True)
    prev_sig = _checksum(cur)

    for rnd in range(max_iter):
        check = (rnd + 1 >= min_rounds) and ((rnd + 1 - min_rounds) % check_every == 0)
        t_rd = time.time()
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        LAST_STATS["rounds"] = rnd + 1
        LAST_STATS.setdefault("round_secs", []).append(round(time.time() - t_rd, 2))
        if not check:
            continue
        t_cs = time.time()
        sig = _checksum(cur)
        LAST_STATS["checksums"].append((rnd + 1, round(time.time() - t_cs, 2)))
        if sig == prev_sig:
            break
        if sig[0] <= driver_finish_edges:
            return _finish_on_driver(cur.toPandas())
        prev_sig = sig
    else:
        raise RuntimeError(f"connected components did not converge in {max_iter} rounds")

    # at the fixpoint every canonical edge is (root, member) with root = the
    # component minimum (canonical form puts the smaller id in `a`);
    # roots map to themselves
    members = cur.select(F.col("b").alias("id"), F.col("a").alias("cluster_id"))
    roots = cur.select(F.col("a").alias("id"), F.col("a").alias("cluster_id"))
    return members.union(roots).distinct()


def assign_clusters(
    all_ids: DataFrame, edges: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Full assignment table: every id gets a cluster (its component's min
    id, or itself if isolated). One left join — broadcast when the
    component table is small, sort-merge otherwise (Catalyst's call)."""
    comp = connected_components(edges)
    out = (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        )
    )
    return out
