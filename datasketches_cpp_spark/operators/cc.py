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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


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


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38) accumulator: ANSI-safe (no long overflow) and commutative
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
        ).alias("cs"),
    ).collect()[0]
    return int(row["n"]), int(row["cs"])


def connected_components(
    edges: DataFrame, max_iter: int = 40, min_rounds: int = 3, check_every: int = 2
) -> DataFrame:
    """Edge list (a, b) → assignments (id, cluster_id) where cluster_id is
    the component's minimum node id. Nodes absent from the edge list are
    the caller's to add back (singletons keep their own id).

    Driver-barrier economy: every round gets a LAZY localCheckpoint (cuts
    lineage when materialized), but the blocking convergence checksum runs
    only every ``check_every`` rounds after ``min_rounds`` — so one driver
    round-trip executes ``check_every`` rounds of DataFrame algebra as one
    job. The fixpoint is detected at worst ``check_every - 1`` rounds late;
    extra rounds on a converged (tiny, star-shaped) edge set cost far less
    than the saved cluster-wide barriers. Any graph with a path of length
    > 2 needs multiple rounds, so checks before ``min_rounds`` are pure
    latency."""
    cur = _canonical(edges).localCheckpoint(eager=True)
    prev_sig = _checksum(cur)
    if prev_sig[0] == 0:
        return edges.sparkSession.createDataFrame(
            [], schema=edges.select(
                edges["a"].alias("id"), edges["b"].alias("cluster_id")
            ).schema,
        )
    for rnd in range(max_iter):
        eager = (rnd + 1 >= min_rounds) and ((rnd + 1 - min_rounds) % check_every == 0)
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        if not eager:
            continue
        sig = _checksum(cur)
        if sig == prev_sig:
            break
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
