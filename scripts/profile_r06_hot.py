#!/usr/bin/env python
"""Round-6 stage-level profile of the two hot bench queries (doc_dedup,
substring) at a given SF dir. Counts each intermediate eagerly to localize
time (guide §1). Usage: python scripts/profile_r06_hot.py [sf_dir] [which]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from datasketches_cpp_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="profile_r06")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import __spark_entry__ as entry

    def t(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        v = fn()
        out[name] = {"sec": round(time.time() - t0, 2), "val": v}
        print(name, out[name], flush=True)
        spark.sparkContext.setJobDescription(None)
        return v

    if which in ("both", "doc_dedup"):
        from datasketches_cpp_spark.operators.cc import LAST_STATS
        from datasketches_cpp_spark.operators.lsh import candidate_pairs, explode_bands
        from datasketches_cpp_spark.operators.minhash import compute_signatures
        from datasketches_cpp_spark.operators.verify import verify_pairs

        cfg = entry.DOC_CFG
        sig = compute_signatures(docs, "doc_id", "text", cfg, kind="text")
        t("dd_sig_noop", lambda: sig.write.format("noop").mode("overwrite").save())
        sigc = sig.localCheckpoint(eager=True)
        t("dd_bands_rows", lambda: explode_bands(sigc).count())
        grouped = (
            explode_bands(sigc).groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_set(F.col("id"))).alias("ids"))
            .where(F.size("ids") >= 2)
        )
        gstats = t(
            "dd_group_stats",
            lambda: grouped.select(
                F.count(F.lit(1)).alias("groups"),
                F.sum(F.size("ids")).alias("members"),
                F.max(F.size("ids")).alias("max_sz"),
                F.sum(
                    F.when(
                        F.size("ids") <= 256,
                        F.size("ids") * (F.size("ids") - 1) / 2,
                    ).otherwise(2 * (F.size("ids") - 1))
                ).alias("pairs_est"),
            ).collect()[0].asDict(),
        )
        pairs = candidate_pairs(sigc, max_pairs_group=256)
        t("dd_pairs_count", lambda: pairs.count())
        pc = pairs.localCheckpoint(eager=True)
        ver = verify_pairs(pc, sigc, cfg, use_simhash=True)
        t("dd_verify_count", lambda: ver.where("passed").count())
        # full query for reference
        t("dd_full", lambda: entry.q_lsh_dedup_clusters(spark, sf_dir).count())
        out["dd_cc_stats"] = dict(LAST_STATS)

    if which in ("both", "substring"):
        from datasketches_cpp_spark.operators.substring import substring_pairs

        # replicate internals with counts: monkey-profile by re-building
        from datasketches_cpp_spark.operators.sigkernel import token_shingle_hashes  # noqa: F401

        cfg = entry.DOC_CFG
        # reuse internal structure: call substring_pairs pieces manually
        import numpy as np  # noqa: F401
        import pandas as pd  # noqa: F401

        # postings via the module's own mapInPandas closure is private;
        # easiest: time the full query plus candidate-stage counts built here
        from datasketches_cpp_spark.operators import substring as sub

        id_col, text_col = "doc_id", "text"
        w = cfg.shingle_w
        seed = cfg.seed
        min_tokens = max(3, w)
        id_type = dict(docs.dtypes)[id_col]
        shingle_schema = f"id {id_type}, shingle long, is_min boolean, n_tokens int"

        def post(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                texts = pdf[text_col].fillna("").tolist()
                sh, off = sub.token_shingle_hashes(texts, w, seed)
                n_tok = [len(x.split()) for x in texts]
                ids_out, sh_out, ismin, ntok_out = [], [], [], []
                for i, rid in enumerate(pdf[id_col]):
                    seg = np.unique(sh[off[i] : off[i + 1]])
                    if len(seg) == 0 or n_tok[i] < min_tokens:
                        continue
                    ids_out.extend([rid] * len(seg))
                    sh_out.append(seg.astype(np.int64))
                    flags = np.zeros(len(seg), dtype=bool)
                    flags[0] = True
                    ismin.append(flags)
                    ntok_out.extend([n_tok[i]] * len(seg))
                if not ids_out:
                    continue
                yield pd.DataFrame(
                    {
                        "id": ids_out,
                        "shingle": np.concatenate(sh_out),
                        "is_min": np.concatenate(ismin),
                        "n_tokens": np.array(ntok_out, dtype=np.int32),
                    }
                )

        postings = docs.select(id_col, text_col).mapInPandas(post, shingle_schema)
        postings = postings.localCheckpoint(eager=True)
        t("ss_postings_rows", lambda: postings.count())
        probes_min = postings.where("is_min")
        t("ss_probe_rows", lambda: probes_min.count())
        t(
            "ss_distinct_min_shingles",
            lambda: probes_min.select("shingle").distinct().count(),
        )
        min_shingles = probes_min.select("shingle").distinct()
        pruned = postings.join(F.broadcast(min_shingles), "shingle", "left_semi")
        t("ss_pruned_rows", lambda: pruned.count())
        from pyspark.sql import Window

        wnd = Window.partitionBy("shingle").orderBy("id")
        hosts = (
            pruned.withColumn("rn", F.row_number().over(wnd))
            .where(F.col("rn") <= 4096)
            .select("shingle", F.col("id").alias("host_id"), F.col("n_tokens").alias("host_tokens"))
        )
        t("ss_hosts_rows", lambda: hosts.count())
        probes = probes_min.select(
            F.col("id").alias("needle_id"), F.col("n_tokens").alias("needle_tokens"), "shingle"
        )
        cand = (
            probes.join(hosts, "shingle")
            .where(
                (F.col("needle_id") != F.col("host_id"))
                & (F.col("needle_tokens") < F.col("host_tokens"))
            )
        )
        t("ss_cand_rows_prededup", lambda: cand.count())
        t("ss_cand_rows", lambda: cand.dropDuplicates(["needle_id", "host_id"]).count())
        t("ss_full", lambda: substring_pairs(docs, "doc_id", "text", cfg, max_posting_list=4096).select("a", "b").count())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
