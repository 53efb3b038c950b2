"""S4-S6: LSH banding → hot-band skew defusal → candidate pair generation.

Banding is a pure `posexplode` of the precomputed band-hash arrays followed
by `groupBy(band_idx, band_hash)`. Two scale guards, both deterministic:

1. **Singleton pruning** — band groups of size 1 (the vast majority on a
   real corpus) are dropped *before* the Python pair-gen stage via a
   semi-join against the band-size aggregate, so `applyInPandas` only ever
   sees groups that can emit a pair. The size aggregate is the
   frequent-items-style hot-key pre-pass of SURVEY.md §2B S5 (reference
   heavy-hitter semantics: fi/include/frequent_items_sketch.hpp:143-175).

2. **Hot-group capping** — a band shared by s documents emits s(s-1)/2
   pairs; a degenerate band (e.g. a boilerplate caption) would emit
   billions. Groups larger than ``max_pairs_group`` switch to
   chain+hub edges (s-1 + s-1 edges): connectivity for connected
   components is fully preserved, pair-level recall within the group is
   delegated to the verifier over those edges. The cap is part of the
   config fingerprint — the oracle applies the identical rule, so cluster
   assignments still match exactly.

Why not a SQL self-join? `bands JOIN bands ON band` is JVM-only but its
output *is* the quadratic blowup — AQE can split the skewed partition but
cannot cap the semantics. The cap must be applied while the group is in
hand, which is exactly what `applyInPandas` gives us.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def explode_bands(sig_df: DataFrame) -> DataFrame:
    """(id, bands[]) → (band_idx, band_hash, id); rows with no shingles are
    excluded (their all-sentinel signatures would otherwise collide into one
    giant false band group)."""
    return (
        sig_df.where(F.col("n_shingles") > 0)
        .select("id", F.posexplode("bands").alias("band_idx", "band_hash"))
    )


def band_group_sizes(bands_df: DataFrame) -> DataFrame:
    """Group-size pre-count: one map-side-combinable agg. Doubles as the
    skew diagnostic (top-N hottest bands = heavy hitters)."""
    return bands_df.groupBy("band_idx", "band_hash").count()


def candidate_pairs(
    sig_df: DataFrame,
    max_pairs_group: int = 256,
) -> DataFrame:
    """sig table → deduplicated candidate pair table (a < b)."""
    return pairs_from_bands(explode_bands(sig_df), max_pairs_group)


def pairs_from_bands(
    bands_df: DataFrame,
    max_pairs_group: int = 256,
) -> DataFrame:
    """(band_idx, band_hash, id) → deduplicated (a, b) candidate pairs.
    Shared by the MinHash lane and the pHash multi-index lane (and any
    future blocking scheme): singleton pruning + hot-group capping live
    here once.

    Hybrid physical plan: groups of size 2..max_pairs_group — the
    overwhelming majority — pair up via a JVM-side equi-self-join on
    (band_idx, band_hash) (whole-stage codegen, AQE-splittable, zero
    Python). Only groups *above* the cap are routed to the Python
    chain+hub path; excluding them from the join is what makes the join
    safe (the quadratic blowup cannot occur — every joined group is
    ≤ max_pairs_group wide). Semantics are identical to the previous
    all-Python version: same pairs, same capped edges."""
    sizes = band_group_sizes(bands_df)
    normal_keys = sizes.where(
        (F.col("count") >= 2) & (F.col("count") <= max_pairs_group)
    ).select("band_idx", "band_hash")
    hot_keys = sizes.where(F.col("count") > max_pairs_group).select(
        "band_idx", "band_hash"
    )

    # common path: self-join, a < b — no Python
    normal = bands_df.join(normal_keys, ["band_idx", "band_hash"], "left_semi")
    left = normal.select("band_idx", "band_hash", F.col("id").alias("a"))
    right = normal.select("band_idx", "band_hash", F.col("id").alias("b"))
    join_pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )

    # hot path: chain + hub — 2(s-1) edges, connectivity preserved; pair
    # recall within the group is delegated to the verifier over those edges
    hot = bands_df.join(hot_keys, ["band_idx", "band_hash"], "left_semi")
    id_type = dict(bands_df.dtypes)["id"]
    out_schema = f"a {id_type}, b {id_type}"

    def gen_capped(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(pdf["id"].to_numpy())
        ids = pd.unique(ids)
        s = len(ids)
        if s < 2:
            return pd.DataFrame({"a": [], "b": []})
        hub = ids[0]
        a = np.concatenate([ids[:-1], np.full(s - 1, hub)])
        b = np.concatenate([ids[1:], ids[1:]])
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    hot_pairs = hot.groupBy("band_idx", "band_hash").applyInPandas(
        gen_capped, out_schema
    )
    return join_pairs.union(hot_pairs).dropDuplicates(["a", "b"])


def hot_bands(sig_df: DataFrame, threshold: int = 1000) -> DataFrame:
    """Diagnostic: bands whose group size exceeds ``threshold`` — the
    heavy-hitter report (reference fi semantics #27) surfaced to metrics."""
    return (
        band_group_sizes(explode_bands(sig_df))
        .where(F.col("count") > threshold)
        .orderBy(F.desc("count"))
    )
