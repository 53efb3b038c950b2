#!/usr/bin/env python
"""The training-data curation toolkit in one pass: semantic dedup over
embeddings (SemDeDup), winnowing fingerprints + exact/near text dedup
signals, quality + language + token stats — each a handful of DataFrame
ops over the driver tables. Run:

    spark-submit --py-files dist/datasketches_cpp_spark.zip \
        examples/training_data_ops.py /root/testdata/sf0.01
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from datasketches_cpp_spark.operators.knn import semantic_dedup
from datasketches_cpp_spark.operators.textstats import (
    with_bpe_token_estimate,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
    winnow_fingerprints,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# -- semantic dedup (SemDeDup): k-means buckets + within-bucket cosine ------
sem = semantic_dedup(emb, "vec_id", "embedding", threshold=0.4, n_centroids=16)
kept = sem.where("is_kept").count()
print(f"semantic dedup: {emb.count()} vectors -> {kept} kept")

# -- winnowing fingerprints: substring-robust doc fingerprints ---------------
fps = winnow_fingerprints(docs, "doc_id", "text", k=8, w=4)
fp_counts = fps.groupBy("doc_id").count().withColumnRenamed("count", "n_fp")
shared = (
    fps.alias("x")
    .join(fps.alias("y"), (F.col("x.fp") == F.col("y.fp")) & (F.col("x.doc_id") < F.col("y.doc_id")))
    .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    .agg(F.count("*").alias("n_shared"))
    .join(fp_counts.select(F.col("doc_id").alias("a"), F.col("n_fp").alias("n_a")), "a")
    .join(fp_counts.select(F.col("doc_id").alias("b"), F.col("n_fp").alias("n_b")), "b")
    # containment: the smaller doc's fingerprints mostly inside the other's
    .where(F.col("n_shared") / F.least("n_a", "n_b") >= 0.8)
)
print("winnowing containment candidates (>=80% of the smaller side):", shared.count())

# -- per-document curation stats: pure JVM expressions ------------------------
stats = with_bpe_token_estimate(
    with_quality_score(with_language_id(with_fingerprint(docs, "text"), "text"), "text"),
    "text",
)
stats.select(
    "doc_id", "lang_guess", "quality_score", "token_count", "bpe_token_est"
).show(5, truncate=False)
print(
    "corpus:",
    stats.agg(
        F.countDistinct("fingerprint").alias("distinct_fingerprints"),
        F.avg("quality_score").alias("avg_quality"),
        F.sum("token_count").alias("total_tokens"),
    ).collect(),
)

# -- curation: decontaminate -> filter -> pack ------------------------------
from datasketches_cpp_spark.operators.curation import (  # noqa: E402
    c4_quality_flags,
    decontaminate,
    pack_training_sequences,
    with_repetition_stats,
)

bench = docs.where(F.col("doc_id") % 20 == 0)        # stand-in eval set
train = docs.where(F.col("doc_id") % 20 != 0)
decon = decontaminate(train, bench, "doc_id", "text", w=3,
                      max_contamination=0.1)
flags = c4_quality_flags(with_repetition_stats(train, "text", w=3), "text")
# the synthetic corpus is unpunctuated word streams, so the
# terminal-punctuation rule is vacuous here — apply the other five
keep_rules = (
    F.col("f_min_words") & F.col("f_word_len") & F.col("f_no_brace")
    & F.col("f_no_lorem") & F.col("f_no_js")
)
survivors = (
    flags.where(keep_rules & (F.col("repetition_ratio") <= 0.2))
    .join(decon.where("keep").select("doc_id"), "doc_id")
)
print(
    f"curation: {train.count()} train docs -> {survivors.count()} survive "
    "(C4 flags + repetition <= 0.2 + benchmark contamination <= 0.1)"
)
packed = pack_training_sequences(
    with_token_count(survivors.select("doc_id", "text"), "text", "tokens")
    .select("doc_id", "tokens"),
    "doc_id", "tokens", budget=2048,
)
print(
    "packed into",
    packed.agg(F.countDistinct("seq_id")).collect()[0][0],
    "training sequences of ~2048 tokens",
)

# -- round 4: line-level boilerplate dedup + PII scrub -----------------------
from datasketches_cpp_spark.operators.curation import line_dedup_stats, pii_stats

multi = train.select(
    "doc_id",
    F.concat_ws(
        "\n",
        F.lit("SHARED SITE HEADER NAVIGATION BAR"),  # planted boilerplate
        F.col("text"),
        F.lit("COPYRIGHT FOOTER ALL RIGHTS RESERVED"),
    ).alias("text"),
)
ld = line_dedup_stats(multi, "doc_id", "text", max_doc_freq=2, rebuild_text=True)
print(
    "line dedup: avg boilerplate lines/doc =",
    round(ld.agg(F.avg("n_dup_lines")).collect()[0][0], 2),
)
pii = pii_stats(
    train.withColumn(
        "text", F.concat(F.col("text"), F.lit(" reach me at ops@example.com"))
    ),
    "doc_id", "text", redact=True,
)
print(
    "pii scrub: docs with email =",
    pii.where(F.col("n_email") > 0).count(),
    "(all redacted to <PII>)",
)

# -- round 4 session 4: LM perplexity, Gopher rules, mixing, Zipf ------------
from datasketches_cpp_spark.operators.curation import (
    gopher_quality_flags,
    mixing_weights,
    ngram_lm_scores,
)
from datasketches_cpp_spark.operators.textstats import zipf_fit

ppl = ngram_lm_scores(train, "doc_id", "text", ppl_threshold=50.0)
print(
    "bigram-LM perplexity: median ppl =",
    ppl.agg(F.expr("percentile(ppl, 0.5)")).collect()[0][0],
)
gq = gopher_quality_flags(train, "text", min_words=20)
print("gopher keep rate =",
      round(gq.agg(F.avg(F.col("gopher_keep").cast("int"))).collect()[0][0], 3))
mix = mixing_weights(
    with_token_count(train, "text", "tokens"), "lang", "tokens",
    {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1},
    budget_tokens=1_000_000,
)
print("mixing weights:", {r.lang: r.weight for r in mix.collect()})
print("zipf fit:", zipf_fit(train, "text").collect()[0].asDict())
spark.stop()
