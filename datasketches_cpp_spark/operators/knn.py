"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k: broadcast the (small) probe set
    against the corpus, JVM-side dot product via F.zip_with + F.aggregate,
    window row_number for the top-k cut. The correctness baseline.
  * lsh_topk — random-hyperplane (SimHash) bucketed ANN: probes only
    compare against corpus rows sharing a hash bucket in ≥1 of several
    hash tables — the 100 TB scale path (candidates shrink by the bucket
    selectivity; recall tunable via tables × bits).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(probe_id, neighbor_id, cosine, rank) — exact top-k by cosine.
    Probes are broadcast (they're the small side by construction); the
    corpus is scanned once, no shuffle until the per-probe top-k window,
    which moves only (probe × corpus-candidates) scored rows."""
    from pyspark.sql import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.crossJoin(broadcast(p))
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("probe_vec"), F.col("vec")))
    )
    wnd = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 9001,
) -> DataFrame:
    """ANN top-k: random-hyperplane bucket join. Each vector gets one
    bucket id per hash table (sign pattern of ``n_bits`` projections);
    probe/corpus rows join on (table, bucket); exact cosine re-ranks the
    candidates. Recall < 1 by design; increase n_tables for more."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_tables, n_bits, seed)

    def bucket_cols(vec):
        out = []
        for t in range(n_tables):
            bits = [
                F.when(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(float(w)) for w in planes[t, b]]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0).cast("double"),
                        lambda acc, v: acc + v,
                    )
                    > 0,
                    F.lit(1 << b),
                ).otherwise(F.lit(0))
                for b in range(n_bits)
            ]
            acc = bits[0]
            for bb in bits[1:]:
                acc = acc + bb
            out.append(acc)
        return F.array(*out)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.posexplode(bucket_cols(F.col(vec_col))).alias("table", "bucket"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.posexplode(bucket_cols(F.col(vec_col))).alias("table", "bucket"),
    )
    cand = (
        c.join(broadcast(p), ["table", "bucket"])
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "probe_vec", "neighbor_id", "vec")
        .dropDuplicates(["probe_id", "neighbor_id"])
        .withColumn("cosine", _cosine(F.col("probe_vec"), F.col("vec")))
    )
    wnd = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
