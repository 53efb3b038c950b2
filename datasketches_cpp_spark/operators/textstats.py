"""Text-analysis operators for training-data pipelines — all JVM-side
(built-in pyspark.sql.functions only; no Python in the hot path).

Provided: token counting, quality scoring (length / punctuation / stopword
ratios), n-gram-free language-ID heuristic, rolling-hash document
fingerprint, and exact token-set Jaccard pairs (the inverted-index exact
path that the MinHash lane approximates)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from"
).split()


def with_token_count(df: DataFrame, text_col: str, out: str = "token_count") -> DataFrame:
    """Whitespace token count; empty/blank/NULL text counts 0 (without
    the coalesce, NULL text slips past the ''-branch and size(NULL)
    returns -1, which then leaks into quality_score)."""
    trimmed = F.coalesce(F.trim(F.col(text_col)), F.lit(""))
    return df.withColumn(
        out,
        F.when(trimmed == "", F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+"))
        ),
    )


# GPT-2-style pre-tokenizer shape, restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB/oracle): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, then
# whitespace runs. No lookarounds (RE2 has none).
BPE_ISH_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def with_bpe_token_estimate(
    df: DataFrame, text_col: str, out: str = "bpe_token_est"
) -> DataFrame:
    """BPE-ish token-count estimate: occurrences of the pre-tokenizer
    pattern (the piece count BEFORE merges — an upper bound on real BPE
    tokens and the standard cheap budget estimator). Pure JVM
    `regexp_count`, no UDF."""
    return df.withColumn(
        out,
        F.regexp_count(F.trim(F.col(text_col)), F.lit(BPE_ISH_PATTERN)).cast("long"),
    )


def with_quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score:
    n_chars, token_count, avg_token_len, punct_ratio, stopword_ratio,
    quality_score ∈ [0,1]. All whole-stage-codegen expressions."""
    df = with_token_count(df, text_col)
    trimmed = F.trim(F.col(text_col))
    n_chars = F.length(trimmed)
    n_punct = n_chars - F.length(F.regexp_replace(trimmed, r"[^\w\s]", ""))
    tokens = F.split(trimmed, r"\s+")
    n_stop = F.size(
        F.filter(tokens, lambda t: F.lower(t).isin([*_STOPWORDS]))
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        F.col("token_count") > 0, n_stop / F.col("token_count")
    ).otherwise(F.lit(0.0))
    avg_tok = F.when(
        F.col("token_count") > 0, n_chars / F.col("token_count")
    ).otherwise(F.lit(0.0))
    # crude composite: long enough, not punctuation soup, some connective
    # tissue, sane token lengths
    score = (
        F.least(F.col("token_count") / F.lit(20.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.15
        + F.when((avg_tok >= 3) & (avg_tok <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.15
    )
    return (
        df.withColumn("n_chars", n_chars.cast("int"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("avg_token_len", avg_tok.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def with_language_id(df: DataFrame, text_col: str, out: str = "lang_guess") -> DataFrame:
    """Tiny stopword-vote language heuristic (en/de/fr/unknown) — a
    placeholder for a real n-gram model, but a true Spark expression
    (no UDF): counts of marker words per language, argmax."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    votes = {
        "en": ["the", "and", "of", "is", "to"],
        "de": ["der", "die", "und", "ist", "das"],
        "fr": ["le", "la", "et", "est", "les"],
    }
    def marker_count(markers):
        # NB: the HOF lambda must take exactly ONE param — pyspark binds a
        # second param to the element index, silently shadowing defaults
        return F.size(F.filter(tokens, lambda t: t.isin(markers)))

    cols = {lang: marker_count(markers) for lang, markers in votes.items()}
    best = F.greatest(*cols.values())
    guess = (
        F.when(best == 0, F.lit("unknown"))
        .when(cols["en"] == best, F.lit("en"))
        .when(cols["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn(out, guess)


def with_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the normalized text
    (lowercase, collapsed whitespace) — the exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.xxhash64(norm))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out: str = "fp",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting"): slide a
    window of ``w`` consecutive ``k``-grams and select each window's
    minimum — any shared substring of length >= k + w - 1 is GUARANTEED to
    contribute at least one common fingerprint, and expected density is
    2/(w+1). The window minimum is taken by k-gram VALUE order (ties
    collapse to one value row), so the selected fingerprint SET is
    tie-break-independent and exactly re-derivable in ANSI SQL — the
    driver oracle hash-checks it.

    Entirely Catalyst expressions (transform/sequence/slice/array_min over
    substrings — zero Python, zero shuffle until the caller aggregates):
    one row per (id, distinct selected k-gram). Documents shorter than k
    emit no rows; documents with fewer than w k-grams emit their single
    global minimum."""
    t = F.col(text_col)
    grams_expr = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (k - 1)),
            lambda i: t.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = F.col("_grams")
    nw = F.size(g) - (w - 1)
    selected = (
        F.when(
            nw >= 1,
            F.transform(
                F.sequence(F.lit(1), nw), lambda j: F.array_min(F.slice(g, j, w))
            ),
        )
        .when(F.size(g) > 0, F.array(F.array_min(g)))
        .otherwise(F.array().cast("array<string>"))
    )
    return (
        df.withColumn("_grams", grams_expr)
        .select(F.col(id_col), F.explode(F.array_distinct(selected)).alias(out))
    )


def exact_ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    w: int = 1,
    max_posting_list: int = 1024,
) -> DataFrame:
    """Token w-gram-set Jaccard over all pairs sharing ≥1 gram — the
    inverted-index join the MinHash lane approximates, fully JVM-side:

        w-grams → explode+distinct → cap hot posting lists → self-join on
        gram → |A∩B| per pair → filter J ≥ threshold.

    Skew contract (part of the operator's semantics, mirrored verbatim in
    the DuckDB oracle): each gram's posting list is capped at
    ``max_posting_list`` ids, deterministically (smallest ids kept, via a
    windowed rank — spills instead of materializing a hot list). Without
    the cap one stop-word-grade gram at 100× corpus scale produces a
    Σ|posting|² pair explosion. Consequences: intersection counts use
    capped postings (set sizes stay uncapped), so a pair sharing ONLY
    hyper-hot grams past the cap can be missed — those pairs are the
    MinHash+LSH lane's job. ``max_posting_list=None`` disables the cap
    (oracle/small-corpus use).
    Returns (a, b, jaccard)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    if w == 1:
        gram = F.explode(toks).alias("t")
        base = df.select(F.col(id_col).alias("id"), gram).where(F.col("t") != "")
    else:
        # guard: Spark's sequence(1, 0) counts DOWN — docs shorter than w
        # tokens must yield an empty gram list, not a bogus descending one
        grams = F.when(
            F.size(toks) >= w,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (w - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(w)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        base = df.select(
            F.col(id_col).alias("id"), F.explode(grams).alias("t")
        ).where(F.col("t") != "")
    tok = base.distinct()
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if max_posting_list is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy("t").orderBy("id")
        tok = (
            tok.withColumn("rn", F.row_number().over(wnd))
            .where(F.col("rn") <= max_posting_list)
            .drop("rn")
        )
    inter = (
        tok.alias("x")
        .join(tok.alias("y"), "t")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 1000) -> DataFrame:
    """Corpus-health diagnostic: least-squares fit of log10(frequency)
    against log10(rank) over the ``top_n`` most frequent words — natural
    language tracks Zipf's law with slope ≈ −1; synthetic, templated, or
    collapsed corpora diverge (flat slope = uniform vocab, steep =
    boilerplate domination), which makes the slope + R² a cheap
    before/after tripwire for every curation stage upstream.

    One explode→groupBy(word) shuffle for the frequency table, a
    bounded orderBy().limit(top_n) for the head (driver never sees
    rows; the single-partition window ranks only the capped head — the
    cc.py bounded-materialization discipline), and the fit itself is
    Catalyst's regr_slope/regr_intercept/regr_r2 aggregates. Returns
    ONE row: (n_types, n_tokens, zipf_slope, zipf_intercept, zipf_r2).
    """
    from pyspark.sql import Window

    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda w: w != F.lit(""),
    )
    counts = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("n_tokens"),
    )
    head = counts.orderBy(F.desc("n"), F.asc("w")).limit(top_n)
    ranked = head.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("w"))),
    )
    y = F.log10(F.col("n").cast("double"))
    x = F.log10(F.col("rank").cast("double"))
    fit = ranked.agg(
        F.round(F.regr_slope(y, x), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 6).alias("zipf_r2"),
    )
    return totals.crossJoin(F.broadcast(fit))


def winnow_fingerprints_positioned(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(id, fp, pos) — winnowing fingerprints WITH their 0-based char
    positions (winnow_fingerprints collapses to the distinct value set,
    which is what set-overlap scoring needs; offset voting needs
    positions). Per window the minimum k-gram is selected by VALUE and
    its position is the FIRST occurrence inside the window
    (array_position), so the (fp, pos) set is deterministic and the
    winnowing guarantee holds positionally: every window fully inside a
    shared substring selects the same gram at the same relative offset.
    Entirely Catalyst expressions — zero Python, zero shuffle."""
    t = F.col(text_col)
    grams_expr = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (k - 1)),
            lambda i: t.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = F.col("_grams")
    nw = F.size(g) - (w - 1)

    def pick(j):
        m = F.array_min(F.slice(g, j, w))
        return F.struct(
            m.alias("fp"),
            (F.array_position(F.slice(g, j, w), m) + j - 2)
            .cast("int")
            .alias("pos"),
        )

    selected = (
        F.when(nw >= 1, F.transform(F.sequence(F.lit(1), nw), pick))
        .when(F.size(g) > 0, F.array(pick(F.lit(1))))
        .otherwise(F.array().cast("array<struct<fp:string,pos:int>>"))
    )
    return (
        df.withColumn("_grams", grams_expr)
        .select(
            F.col(id_col), F.explode(F.array_distinct(selected)).alias("s")
        )
        .select(id_col, F.col("s.fp").alias("fp"), F.col("s.pos").alias("pos"))
    )


def text_containment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_match_frac: float = 0.8,
    min_aligned: int = 2,
    max_entries_per_fp: int = 64,
) -> DataFrame:
    """Doc-in-doc (quotation / verbatim-inclusion) detection: (clip_id,
    container_id, aligned_fps, clip_fps, match_frac, char_offset) for
    oriented pairs where ≥ ``min_match_frac`` of the shorter document's
    winnowing fingerprints recur in the longer one AT ONE CONSISTENT
    character offset — the same offset-vote histogram as the audio/video
    containment lanes, in text space. A verbatim inclusion scores
    match_frac 1.0 at the exact insertion offset (winnowing's positional
    guarantee); local edits lower it locally.

    Plan shape: one groupBy(fp) shuffle (hot fingerprints above
    ``max_entries_per_fp`` dropped — boilerplate, the audio lane's hot
    rule), JVM pair expansion, two narrow aggs (votes, best offset with
    the earliest-offset tiebreak), and per-doc fingerprint-count joins.
    Zero Python anywhere — the fingerprint stage is pure Catalyst."""
    fps = winnow_fingerprints_positioned(
        df, id_col=id_col, text_col=text_col, k=k, w=w
    ).localCheckpoint(eager=False)
    counts = fps.groupBy(F.col(id_col).alias("did")).agg(
        F.count(F.lit(1)).alias("n_fps")
    )
    grouped = (
        fps.groupBy("fp")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), "pos")
            ).alias("es")
        )
        .where((F.size("es") >= 2) & (F.size("es") <= max_entries_per_fp))
    )
    pairs = (
        grouped.select(F.explode("es").alias("ea"), "es")
        .select("ea", F.explode("es").alias("eb"))
        .where(F.col("ea.id") != F.col("eb.id"))
    )
    votes = pairs.select(
        F.col("ea.id").alias("clip_id"),
        F.col("eb.id").alias("container_id"),
        (F.col("eb.pos") - F.col("ea.pos")).alias("dt"),
        F.col("ea.pos").alias("clip_pos"),
    ).groupBy("clip_id", "container_id", "dt").agg(
        F.countDistinct("clip_pos").alias("aligned")
    )
    best = (
        votes.groupBy("clip_id", "container_id")
        .agg(
            F.max(F.struct(F.col("aligned"), (-F.col("dt")).alias("ndt")))
            .alias("best")
        )
        .select(
            "clip_id",
            "container_id",
            F.col("best.aligned").alias("aligned_fps"),
            (-F.col("best.ndt")).alias("char_offset"),
        )
    )
    out = (
        best.join(
            counts.select(
                F.col("did").alias("clip_id"), F.col("n_fps").alias("clip_fps")
            ),
            "clip_id",
        )
        .join(
            counts.select(
                F.col("did").alias("container_id"),
                F.col("n_fps").alias("container_fps"),
            ),
            "container_id",
        )
        .withColumn("match_frac", F.col("aligned_fps") / F.col("clip_fps"))
    )
    return out.where(
        (F.col("aligned_fps") >= min_aligned)
        & (F.col("match_frac") >= min_match_frac)
        & (F.col("container_fps") >= F.col("clip_fps"))
    ).select(
        "clip_id",
        "container_id",
        "aligned_fps",
        "clip_fps",
        "match_frac",
        "char_offset",
    )
