"""Corpus-curation operators for LLM training-data pipelines: benchmark
decontamination, intra-document repetition stats, C4-style heuristic
filters, and token-budget sequence packing.

These extend the text-analysis family (textstats.py) with the remaining
ops a 100 TB curation run needs before tokenization. Design rules shared
with the rest of the engine:

* JVM-only hot paths — every per-document computation is built-in
  ``pyspark.sql.functions`` expressions (whole-stage codegen); the only
  Python is driver-side planning.
* The big side never fans out through an explode→shuffle when a broadcast
  semi-join can answer the question (decontamination: the benchmark side
  is small by definition — benchmarks are MBs, training corpora are TBs).
* Global-order operations (sequence packing) use the engine's two-level
  prefix-sum pattern (functions/sampling.py ebpps lattice): partition-local
  window + driver-side prefix of per-partition totals — never a
  single-partition global window.

Reference analog: the reference is a sketch library, not a curation
pipeline, but the contamination measure below is the same set-overlap
question its theta/jaccard family answers approximately
(theta_jaccard_similarity.hpp); here the benchmark side is small enough to
answer exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _word_ngrams(text_col: str, w: int):
    """Array of space-joined word w-grams of ``text_col`` (empty array when
    fewer than w tokens). Pure expression: split → slide → join."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # sequence(0, n-w) is invalid when n < w: guard with an empty array.
    idx = F.when(n >= w, F.sequence(F.lit(0), n - F.lit(w))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, w), " ")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 3,
    max_contamination: float = 0.1,
    bench_side: str = "broadcast",
    bloom_fpp: float = 0.001,
) -> DataFrame:
    """Benchmark decontamination: for each training document, the fraction
    of its distinct word ``w``-grams that also occur anywhere in the
    benchmark corpus, plus a keep/drop decision.

    Returns one row per train document: ``(id, total_ngrams,
    contaminated_ngrams, contamination, keep)``. ``contamination`` is 0.0
    for documents shorter than ``w`` tokens (nothing to match on ⇒ keep).

    Scale shape, selected by ``bench_side``:

    * ``"broadcast"`` (default) — the benchmark n-gram set is built once,
      deduplicated, and BROADCAST; the train side explodes to distinct
      (id, gram) pairs and answers membership with a broadcast hash
      semi-join, so the only wide exchange is the per-id count
      re-aggregation of (id, matched) partials (map-side combined). Right
      whenever the benchmark gram set fits an executor (benchmarks are
      usually MBs against a TB corpus).
    * ``"bloom"`` — for benchmark suites too large to broadcast exactly:
      a bloom filter over the bench grams (functions/bloom.py,
      ``bloom_fpp`` target) prunes the train grams map-side, and only the
      surviving ~(true hits + fpp) slice is shuffle-joined against the
      exact bench set to strike false positives. Results are IDENTICAL to
      the broadcast path (no false negatives; the exact join removes false
      positives) — only the shuffled volume changes. The doc-gram totals
      come from a separate pre-filter aggregation, so the full gram stream
      is still never shuffled by gram.
    """
    bench_grams = (
        benchmark.select(F.explode(_word_ngrams(text_col, w)).alias("g"))
        .distinct()
    )
    train_grams = (
        train.select(F.col(id_col), F.explode(_word_ngrams(text_col, w)).alias("g"))
        .distinct()
    )
    if bench_side == "bloom":
        per_doc = _decontaminate_counts_bloom(
            train_grams, bench_grams, id_col, bloom_fpp
        )
    elif bench_side == "broadcast":
        hit = F.broadcast(bench_grams.withColumn("_hit", F.lit(1)))
        per_doc = (
            train_grams.join(hit, "g", "left")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("total_ngrams"),
                F.coalesce(F.sum("_hit"), F.lit(0)).alias("contaminated_ngrams"),
            )
        )
    else:
        raise ValueError(f"bench_side must be 'broadcast' or 'bloom', got {bench_side!r}")
    # Documents with < w tokens produce no grams and drop out of the
    # aggregate — restore them as clean (0 grams, keep).
    all_ids = train.select(id_col).distinct()
    out = (
        all_ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("total_ngrams"), F.lit(0)).alias("total_ngrams"),
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0)).alias(
                "contaminated_ngrams"
            ),
        )
        .withColumn(
            "contamination",
            F.when(F.col("total_ngrams") > 0,
                   F.col("contaminated_ngrams") / F.col("total_ngrams"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("keep", F.col("contamination") <= F.lit(max_contamination))
    )
    return out


def _decontaminate_counts_bloom(
    train_grams: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    fpp: float,
) -> DataFrame:
    """(id, total_ngrams, contaminated_ngrams) with a bloom-pruned exact
    join instead of a broadcast of the full bench gram set. Exact counts:
    the bloom has no false negatives and the inner join strikes its false
    positives."""
    from ..functions.bloom import (
        bloom_filter_agg,
        might_contain,
        suggest_num_bits,
        suggest_num_hashes_from,
    )

    n = bench_grams.count()
    m = suggest_num_bits(max(n, 1), fpp)
    k = suggest_num_hashes_from(max(n, 1), m)
    filt = bloom_filter_agg(bench_grams, "g", m, k)
    totals = train_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_ngrams")
    )
    candidates = (
        might_contain(train_grams, filt, "g")
        .where(F.col("might_contain"))
        .drop("might_contain")
    )
    matched = candidates.join(bench_grams, "g", "inner").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("contaminated_ngrams")
    )
    return totals.join(matched, id_col, "left").select(
        id_col,
        "total_ngrams",
        F.coalesce(F.col("contaminated_ngrams"), F.lit(0)).alias(
            "contaminated_ngrams"
        ),
    )


def with_repetition_stats(
    df: DataFrame, text_col: str, w: int = 3
) -> DataFrame:
    """Gopher-style intra-document repetition: the fraction of word
    ``w``-gram *occurrences* that are repeats of an earlier occurrence in
    the same document (``1 − distinct/total``; 0.0 when the document has
    fewer than ``w`` tokens).

    Adds ``ngram_total``, ``ngram_distinct``, ``repetition_ratio``. Entirely
    array expressions on the row — no explode, no shuffle, no UDF: the
    filter runs at scan speed and composes with predicate pushdown."""
    grams = _word_ngrams(text_col, w)
    df = df.withColumn("_grams", grams)
    out = (
        df.withColumn("ngram_total", F.size("_grams").cast("long"))
        .withColumn(
            "ngram_distinct", F.size(F.array_distinct("_grams")).cast("long")
        )
        .withColumn(
            "repetition_ratio",
            F.when(
                F.col("ngram_total") > 0,
                1.0 - F.col("ngram_distinct") / F.col("ngram_total"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_grams")
    )
    return out


# C4 (Raffel et al. 2020, §2.2) heuristics, restated at document grain for
# single-block text. Thresholds are the paper's; the curly-brace and
# "lorem ipsum" screens are verbatim C4 rules.
_C4_MIN_WORDS = 5
_C4_MAX_MEAN_WORD_LEN = 10.0


def c4_quality_flags(df: DataFrame, text_col: str) -> DataFrame:
    """C4-style heuristic filter flags, one boolean per rule plus the
    conjunction ``c4_keep``:

    * ``f_terminal``  — text ends in terminal punctuation (. ! ? ")
    * ``f_min_words`` — at least 5 whitespace words
    * ``f_word_len``  — mean word length ≤ 10 chars (gibberish screen)
    * ``f_no_brace``  — no curly brace (code screen)
    * ``f_no_lorem``  — no "lorem ipsum" (boilerplate screen)
    * ``f_no_js``     — no "javascript" token (cookie-warning screen)

    All `regexp`/`length` expressions — the whole filter is one codegen
    stage over the scan, pushdown-friendly."""
    t = F.trim(F.col(text_col))
    low = F.lower(t)
    n_words = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    n_nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = F.when(n_words > 0, n_nonspace / n_words).otherwise(F.lit(0.0))
    df = (
        df.withColumn("f_terminal", t.rlike(r'[.!?"]$'))
        .withColumn("f_min_words", n_words >= _C4_MIN_WORDS)
        .withColumn("f_word_len", mean_wl <= _C4_MAX_MEAN_WORD_LEN)
        .withColumn("f_no_brace", ~low.contains("{") & ~low.contains("}"))
        .withColumn("f_no_lorem", ~low.contains("lorem ipsum"))
        .withColumn("f_no_js", ~low.contains("javascript"))
    )
    keep = (
        F.col("f_terminal")
        & F.col("f_min_words")
        & F.col("f_word_len")
        & F.col("f_no_brace")
        & F.col("f_no_lorem")
        & F.col("f_no_js")
    )
    return df.withColumn("c4_keep", keep)


def pack_training_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence by
    document-boundary chunking: documents are taken in ``id_col`` order and
    ``seq_id = floor(tokens_before / budget)`` — every sequence holds a
    contiguous run of documents whose cumulative start falls in its budget
    window (a sequence may overrun by at most its last document, the
    standard concat-then-chunk packing used before fixed-length training).

    Adds ``seq_id`` and ``seq_offset`` (token offset of the document within
    the global concatenation). Deterministic and partition-layout-invariant:
    depends only on the total order of ``id_col``.

    Scale shape: the global running sum uses the engine's two-level prefix
    pattern — ``repartitionByRange(id)`` → window cumsum *within* each
    range partition → per-partition totals (one tiny agg, ≤ P doubles) →
    driver prefix → broadcast offsets. No single-partition global window.
    """
    from pyspark.sql import Window

    P = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = (
        df.repartitionByRange(int(P), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    # localCheckpoint would also pin the layout, but the pid column is only
    # used within this one plan, so recomputation consistency is enough:
    # repartitionByRange is deterministic given the same sampled boundaries
    # within a single action — to be safe across retries, derive offsets and
    # cumsum from the SAME cached frame.
    ranged = ranged.persist()
    try:
        totals = {
            r["_pid"]: r["s"]
            for r in ranged.groupBy("_pid")
            .agg(F.sum(token_count_col).alias("s"))
            .collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(totals):
            offsets[pid] = acc
            # Spark's sum over an all-NULL partition is NULL (None) — treat
            # it as contributing zero tokens rather than raising TypeError
            acc += totals[pid] or 0
        off_expr = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        win = (
            Window.partitionBy("_pid")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = off_expr + F.coalesce(
            F.sum(token_count_col).over(win), F.lit(0)
        )
        out = (
            ranged.withColumn("seq_offset", before.cast("long"))
            .withColumn(
                "seq_id", F.floor(F.col("seq_offset") / F.lit(budget))
            )
            .drop("_pid")
        )
        # Materialization boundary: compute while the source is pinned so
        # executor retries cannot re-sample range boundaries mid-plan.
        # materialize=False exposes the live plan (tests assert its shape);
        # the caller then owns the pin-before-action discipline, INCLUDING
        # the persisted `ranged` frame backing the returned plan — it stays
        # cached until the caller unpersists it (reachable via
        # out.sparkSession.catalog.clearCache() or the frame's lineage);
        # with materialize=True (the default) it is released here.
        if materialize:
            out = out.localCheckpoint(eager=True)
    finally:
        if materialize:
            ranged.unpersist()
    return out


def line_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_line_chars: int = 8,
    max_doc_freq: int = 2,
    rebuild_text: bool = False,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Global line-level deduplication (the RefinedWeb / MassiveText
    boilerplate rule): a trim-normalized line of at least
    ``min_line_chars`` characters that occurs in more than
    ``max_doc_freq`` DISTINCT documents is corpus boilerplate (headers,
    footers, cookie banners, nav chrome).

    Returns one row per document: (id, n_lines, n_dup_lines[, dedup_text
    with the boilerplate lines removed, original order preserved]).

    Scale shape: posexplode(split) → one groupBy(line) with map-side
    combined distinct-doc counting → the hot-line set joins back to the
    line table → one groupBy(id). The hot set is small BY CONSTRUCTION
    (only lines repeated across > max_doc_freq documents survive — it is
    bounded by the corpus's boilerplate vocabulary, not its size), so it
    is BROADCAST by default and the corpus-sized line table never
    shuffles for the join (``broadcast_hot=False`` falls back to a
    sort-merge join for pathological corpora where boilerplate itself is
    huge). All aggregations partial-agg before exchange; no driver
    materialization. Short lines are exempt from the rule (they would
    otherwise all collide: '}', '---', ...), matching the published
    recipes.
    """
    import re as _re

    # F.split takes a REGEX but sep is documented (and rejoined by
    # array_join) as a literal separator — escape it, or sep='|' would
    # split every character
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("_pos", "_line"),
    ).withColumn("_key", F.trim(F.col("_line")))
    eligible = F.length(F.col("_key")) >= min_line_chars
    hot = (
        lines.where(eligible)
        .groupBy("_key")
        .agg(F.countDistinct("_id").alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("_key", F.lit(True).alias("_hot"))
    )
    joined = lines.join(
        F.broadcast(hot) if broadcast_hot else hot, "_key", "left"
    ).withColumn("_dup", F.coalesce(F.col("_hot"), F.lit(False)) & eligible)
    aggs = [
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_dup").cast("long")).alias("n_dup_lines"),
    ]
    if rebuild_text:
        aggs.append(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_dup"),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("dedup_text")
        )
    return (
        joined.groupBy(F.col("_id").alias(id_col))
        .agg(*aggs)
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB) so the oracle can re-derive counts independently: no
# backrefs, no lookaround, explicit classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone_e164": r"\+\d{7,15}",
}


def pii_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    redact: bool = False,
    replacement: str = "<PII>",
) -> DataFrame:
    """Per-document PII detection counts (emails, dotted-quad IPv4,
    E.164-style phone numbers) and optional redaction — the standard
    pre-training scrub pass. Zero shuffles: every column is a built-in
    regexp expression in one whole-stage-codegen projection; redaction
    chains regexp_replace in a deterministic pattern order."""
    cols = [F.col(id_col)] + [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    if redact:
        red = F.col(text_col)
        for pat in PII_PATTERNS.values():
            red = F.regexp_replace(red, pat, replacement)
        cols.append(red.alias("redacted_text"))
    return df.select(*cols)


def _lm_words(text_col: str):
    """Lowercased alpha word array — the LM tokenizer. Deliberately the
    simplest deterministic rule ([a-z]+ runs) so the DuckDB oracle can
    reproduce it exactly; CCNet-style pipelines swap in SentencePiece
    here without touching the counting/scoring plan below."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda w: w != F.lit(""),
    )


# bigram structs from a word array, 0-based Spark SQL array indexing;
# guard size>=2 at the caller
_BIGRAMS = "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"


def train_bigram_lm(df: DataFrame, text_col: str):
    """Train an add-alpha-smoothed word-bigram language model over a
    corpus: returns ``(pairs, prefixes, vocab)`` DataFrames —
    (w1,w2,c12) bigram counts, (w1,c1) prefix counts (c1 = sum of c12
    over w2, the standard MLE conditional denominator), and a 1-row
    (v) vocabulary size. Two shuffles total: one groupBy over exploded
    bigrams, one countDistinct; the prefix table derives from the pair
    table without re-reading the corpus.

    This is the training half of a CCNet-style perplexity quality
    filter (Wenzek et al. 2020 train a KenLM on clean reference text and
    score crawl docs); at 100 TB the reference corpus is the small side,
    so the tables this returns stay broadcast-size."""
    toks = df.select(_lm_words(text_col).alias("ws")).where(F.size("ws") >= 2)
    big = toks.select(F.explode(F.expr(_BIGRAMS)).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    pairs = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    prefixes = pairs.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.select(F.explode("ws").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    return pairs, prefixes, vocab


def ngram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm=None,
    alpha: float = 0.1,
    broadcast_lm: bool = True,
    ppl_threshold: float = 1000.0,
) -> DataFrame:
    """Per-document bigram-LM perplexity quality score (CCNet-style,
    Wenzek et al. 2020): score each document's word bigrams under an
    add-alpha LM, P(w2|w1) = (c12+a)/(c1+a*V), and report
    ppl = exp(-mean log P) plus a ``low_quality`` flag. ``lm`` is the
    (pairs, prefixes, vocab) triple from :func:`train_bigram_lm`; None
    self-trains on ``df`` (every bigram then has c12 >= 1, but the
    unseen-fallback path below is still exercised by external LMs and
    is add-alpha-exact: missing (w1,w2) coalesces c12 to 0, missing w1
    coalesces c1 to 0, so P degrades smoothly to a/(a*V) = 1/V).

    Scale shape: the corpus side explodes to (doc, w1, w2) rows once and
    is never shuffled by gram — the LM joins in (broadcast by default;
    set broadcast_lm=False to shuffle-join when a giant LM is scored
    against a giant corpus) — then ONE groupBy(doc) aggregates the log
    scores. Docs with < 2 alpha words carry no bigrams and are excluded
    (same rule in the oracle SQL).

    Reference analog: none — the reference is a sketch library; this is
    part of the curation layer the north-star pipeline needs. The
    counting plan reuses the decontaminate() discipline above: small
    side broadcast, TB side never fans out through a shuffle-by-gram.
    """
    if lm is None:
        lm = train_bigram_lm(df, text_col)
    pairs, prefixes, vocab = lm
    toks = df.select(
        F.col(id_col), _lm_words(text_col).alias("ws")
    ).where(F.size("ws") >= 2)
    big = toks.select(
        id_col, F.explode(F.expr(_BIGRAMS)).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    maybe_bc = F.broadcast if broadcast_lm else (lambda x: x)
    scored = (
        big.join(maybe_bc(pairs), ["w1", "w2"], "left")
        .join(maybe_bc(prefixes), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(F.exp(-F.col("s") / F.col("n_bigrams")), 4).alias("ppl"),
            (F.exp(-F.col("s") / F.col("n_bigrams")) > F.lit(ppl_threshold)).alias(
                "low_quality"
            ),
        )
    )


def mixing_weights(
    df: DataFrame,
    group_col: str,
    token_col: str,
    targets: dict,
    budget_tokens: int,
) -> DataFrame:
    """Per-source sampling weights to hit a target token mix — the
    Pile/Dolma-style data-mixing step that follows dedup + quality
    filtering: given observed per-group token totals and a target share
    per group, report each group's actual share, the sampling weight
    (target_share / actual_share, >1 means upsample) and the number of
    epochs of that group a ``budget_tokens`` training run consumes
    (budget * target / available — >1 means the source repeats).

    Groups missing from ``targets`` get target 0 (dropped from the mix
    but still reported). ONE shuffle (the groupBy); the corpus total
    joins back as a broadcast scalar and the target map is a codegen
    literal, so nothing else moves.
    """
    agg = df.groupBy(group_col).agg(F.sum(token_col).alias("tokens"))
    total = agg.agg(F.sum("tokens").alias("total_tokens"))
    tmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    share = F.col("tokens") / F.col("total_tokens")
    tgt = F.coalesce(tmap[F.col(group_col)], F.lit(0.0))
    return agg.crossJoin(F.broadcast(total)).select(
        group_col,
        "tokens",
        F.round(share, 6).alias("actual_share"),
        tgt.alias("target_share"),
        F.round(tgt / share, 6).alias("weight"),
        F.round(
            F.lit(float(budget_tokens)) * tgt / F.col("tokens"), 6
        ).alias("epochs_at_budget"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, app. A1.1),
    one boolean per rule plus the conjunction ``gopher_keep``:

    * ``g_word_count``   — whitespace word count in [min_words, max_words]
    * ``g_mean_wl``      — mean word length in [3, 10]
    * ``g_symbol_ratio`` — (# + ellipsis) to word ratio ≤ 0.1
    * ``g_bullet_lines`` — < 90% of lines start with a bullet
    * ``g_ellipsis_lines`` — ≤ 30% of lines end with an ellipsis
    * ``g_alpha_words``  — ≥ 80% of words contain a letter
    * ``g_stopwords``    — ≥ 2 distinct common stop words present

    Like c4_quality_flags: pure `split`/`filter`/`rlike` array
    expressions, ONE codegen stage over the scan, no shuffle. The
    sandbox default lowers min_words to fit short synthetic docs; the
    paper's 50/100k are the defaults here."""
    t = F.trim(F.col(text_col))
    words = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n_words = F.size(words)
    sum_wl = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.when(n_words > 0, sum_wl / n_words).otherwise(F.lit(0.0))
    n_sym = F.regexp_count(t, F.lit(r"#|\.\.\.|…"))
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    n_ell = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    n_alpha = F.size(
        F.filter(words, lambda w: F.lower(w).rlike(r"[a-z]"))
    )
    low_words = F.transform(words, F.lower)
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(low_words),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    df = (
        df.withColumn(
            "g_word_count",
            (n_words >= F.lit(min_words)) & (n_words <= F.lit(max_words)),
        )
        .withColumn("g_mean_wl", (mean_wl >= 3.0) & (mean_wl <= 10.0))
        .withColumn(
            "g_symbol_ratio",
            F.when(n_words > 0, n_sym / n_words <= 0.1).otherwise(False),
        )
        .withColumn(
            "g_bullet_lines",
            F.when(n_lines > 0, n_bullet / n_lines < 0.9).otherwise(True),
        )
        .withColumn(
            "g_ellipsis_lines",
            F.when(n_lines > 0, n_ell / n_lines <= 0.3).otherwise(True),
        )
        .withColumn(
            "g_alpha_words",
            F.when(n_words > 0, n_alpha / n_words >= 0.8).otherwise(False),
        )
        .withColumn("g_stopwords", n_stop >= 2)
    )
    keep = (
        F.col("g_word_count")
        & F.col("g_mean_wl")
        & F.col("g_symbol_ratio")
        & F.col("g_bullet_lines")
        & F.col("g_ellipsis_lines")
        & F.col("g_alpha_words")
        & F.col("g_stopwords")
    )
    return df.withColumn("gopher_keep", keep)


# ---------------------------------------------------------------------------
# Leakage-safe splits and deterministic corpus shuffling (round-4 session 8)
# ---------------------------------------------------------------------------

def _md5_unit_hash(*cols):
    """First 8 hex digits of md5 over the ':'-joined columns — a uniform
    draw from [0, 16^8) expressed as a STRING, so the identical draw is
    re-derivable in any engine with md5() (the DuckDB oracle compares the
    same lowercase hex lexically). Lexical order on fixed-width lowercase
    hex == numeric order, so threshold tests and sorts need no parse."""
    return F.substring(
        F.md5(F.concat_ws(":", *[F.col(c) if isinstance(c, str) else c for c in cols])),
        1, 8,
    )


def split_by_cluster(
    assignments: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: str = "split-v1",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Leakage-safe train/validation/test split: the split KEY is the dedup
    ``cluster_col``, not the document id, so every member of a near-dup
    cluster lands in the SAME split — the standard guard against
    train→eval contamination through near-duplicates (a val doc whose
    near-twin sits in train leaks the answer; splitting by cluster makes
    that impossible by construction).

    ``fractions`` maps split name → fraction (must sum to ~1; default
    90/5/5 train/validation/test). Assignment is a pure deterministic
    projection: u = md5(seed:cluster) ∈ [0,1), split = the band u falls
    in, with bands laid out in sorted-split-name order for determinism.

    Scale shape: ZERO shuffles and zero Python — one codegen expression
    over the assignments frame, composable with any upstream dedup lane
    (exact tier, LSH lane, tiered cascade, streaming cluster store). The
    same row always lands in the same split across runs, epochs, and
    partition layouts; changing ``seed`` re-rolls the entire split.
    """
    fractions = fractions or {"train": 0.90, "validation": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = _md5_unit_hash(F.lit(seed), cluster_col)
    expr, acc = None, 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        thresh = format(min(int(acc * 16**8), 16**8 - 1), "08x")
        cond = h < F.lit(thresh)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return assignments.withColumn("split", expr)


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    seed: str = "shuffle-v1",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Deterministic global training-order shuffle: adds ``shuffle_pos``
    (0-based position in a seeded pseudo-random total order of the whole
    corpus). Equivalent semantics to ``ORDER BY md5(seed:id)`` +
    ``row_number()-1`` — but computed scale-correctly: the order key is
    uniform, so ``repartitionByRange`` on it yields balanced range
    partitions; positions come from the engine's two-level prefix pattern
    (partition-local row_number + driver prefix over ≤P per-partition
    counts), never a single-partition global window.

    Ties are impossible (the sort key includes ``id_col``), so the order —
    and therefore ``shuffle_pos`` — is bit-stable across runs, partition
    layouts, and cluster sizes; changing ``seed`` produces an independent
    permutation. This is the "shuffle once, stream in order" step before
    sequence packing: feed the output (sorted by shuffle_pos) to
    pack_training_sequences for shuffled fixed-budget batches.

    ``materialize=False`` exposes the live plan (tests assert its shape);
    the caller then owns the pin-before-action discipline, INCLUDING the
    persisted range-partitioned frame backing the returned plan — it
    stays cached until the caller releases it (e.g.
    ``out.sparkSession.catalog.clearCache()``); with the default
    ``materialize=True`` it is released here (same contract as
    pack_training_sequences).
    """
    from pyspark.sql import Window

    P = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    key = _md5_unit_hash(F.lit(seed), id_col)
    ranged = (
        df.withColumn("_skey", key)
        .repartitionByRange(int(P), F.col("_skey"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            r["_pid"]: r["c"]
            for r in ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        # empty input: create_map() with no children types as
        # map<string,string> and element_at(_pid:int) fails analysis
        off_expr = F.lit(0) if not offsets else F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        win = Window.partitionBy("_pid").orderBy("_skey", id_col)
        out = (
            ranged.withColumn(
                "shuffle_pos",
                (off_expr + F.row_number().over(win) - 1).cast("long"),
            )
            .drop("_pid", "_skey")
        )
        if materialize:
            out = out.localCheckpoint(eager=True)
    finally:
        if materialize:
            ranged.unpersist()
    return out
