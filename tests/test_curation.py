"""Curation operators: decontamination, repetition stats, C4 flags,
sequence packing. Each checked against a small pure-Python twin, plus the
engine-wide invariants: partition-layout invariance and no-UDF plans for
the per-row ops."""

import pyspark.sql.functions as F
import pytest

from datasketches_cpp_spark.operators.curation import (
    c4_quality_flags,
    decontaminate,
    pack_training_sequences,
    with_repetition_stats,
)


def _ngrams(text, w):
    toks = text.split()
    return [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the cat sat again"),
        (1, "completely unique words never repeated anywhere here"),
        (2, "spark spark spark spark spark spark"),
        (3, "tiny"),
        (4, "benchmark question one about the cat sat on mats"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_matches_python(spark, docs):
    w = 3
    got = {
        r["doc_id"]: r
        for r in with_repetition_stats(docs, "text", w=w).collect()
    }
    for doc_id, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        grams = _ngrams(text, w)
        assert got[doc_id]["ngram_total"] == len(grams)
        assert got[doc_id]["ngram_distinct"] == len(set(grams))
        exp = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        assert got[doc_id]["repetition_ratio"] == pytest.approx(exp)


def test_repetition_plan_has_no_python(spark, docs):
    plan = with_repetition_stats(docs, "text")._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


def test_c4_flags(spark):
    rows = [
        (0, "A good sentence with enough words to pass everything."),
        (1, "no terminal punctuation here at all"),
        (2, "short one."),
        (3, "this has a { brace } in it and still ends fine."),
        (4, "Lorem ipsum dolor sit amet consectetur adipiscing elit."),
        (5, "Please enable javascript to view this page properly."),
        (6, "Pneumonoultramicroscopicsilicovolcanoconiosis " * 6 + "."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_quality_flags(df, "text").collect()}
    assert got[0]["c4_keep"]
    assert not got[1]["f_terminal"] and not got[1]["c4_keep"]
    assert not got[2]["f_min_words"]
    assert not got[3]["f_no_brace"]
    assert not got[4]["f_no_lorem"]
    assert not got[5]["f_no_js"]
    assert not got[6]["f_word_len"]


def test_decontaminate_counts(spark, docs):
    bench = docs.filter("doc_id = 4").select("text")
    train = docs.filter("doc_id < 4")
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, bench, "doc_id", "text", w=2,
                               max_contamination=0.2).collect()
    }
    bench_grams = set(_ngrams("benchmark question one about the cat sat on mats", 2))
    for doc_id, text in [(0, "the cat sat on the mat and the cat sat again"),
                         (1, "completely unique words never repeated anywhere here"),
                         (2, "spark spark spark spark spark spark")]:
        grams = set(_ngrams(text, 2))
        assert out[doc_id]["total_ngrams"] == len(grams)
        assert out[doc_id]["contaminated_ngrams"] == len(grams & bench_grams)
        exp = len(grams & bench_grams) / len(grams)
        assert out[doc_id]["contamination"] == pytest.approx(exp)
        assert out[doc_id]["keep"] == (exp <= 0.2)
    # sub-w-token doc: no grams, clean, kept
    assert out[3]["total_ngrams"] == 0
    assert out[3]["contamination"] == 0.0
    assert out[3]["keep"]


def test_decontaminate_bloom_path_identical(spark, docs):
    bench = docs.filter("doc_id = 4").select("text")
    train = docs.filter("doc_id < 4")
    cols = ["doc_id", "total_ngrams", "contaminated_ngrams", "contamination", "keep"]
    a = sorted(
        tuple(r[c] for c in cols)
        for r in decontaminate(train, bench, "doc_id", "text", w=2).collect()
    )
    b = sorted(
        tuple(r[c] for c in cols)
        for r in decontaminate(train, bench, "doc_id", "text", w=2,
                               bench_side="bloom", bloom_fpp=0.01).collect()
    )
    assert a == b


def test_decontaminate_bad_mode_raises(spark, docs):
    with pytest.raises(ValueError, match="bench_side"):
        decontaminate(docs, docs, "doc_id", "text", bench_side="nope")


def test_decontaminate_broadcasts_benchmark(spark, docs):
    bench = docs.filter("doc_id = 4").select("text")
    train = docs.filter("doc_id < 4")
    plan = (
        decontaminate(train, bench, "doc_id", "text", w=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_matches_serial_rule(spark):
    rows = [(i, (i * 37 + 11) % 90 + 10) for i in range(200)]  # 10..99 tokens
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    budget = 256
    out = pack_training_sequences(df, "doc_id", "tokens", budget,
                                  num_partitions=7)
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    acc = 0
    for i, tok in rows:
        assert got[i] == (acc // budget, acc), f"doc {i}"
        acc += tok


def test_pack_sequences_no_global_window(spark):
    """The scale contract: the running sum must come from the two-level
    prefix pattern (per-range-partition window + broadcast offsets), never
    a single-partition global window."""
    rows = [(i, 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    out = pack_training_sequences(df, "doc_id", "tokens", 64, num_partitions=5,
                                  materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan  # the per-partition cumsum is really a window


def test_pack_sequences_null_tokens_partition(spark):
    """A range partition whose token column is entirely NULL must pack as
    zero tokens, not raise TypeError (Spark sum over all-NULL is NULL)."""
    rows = [(i, None if i < 40 else 10) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    out = pack_training_sequences(df, "doc_id", "tokens", 64, num_partitions=6)
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    acc = 0
    for i, tok in rows:
        assert got[i] == (acc // 64, acc), f"doc {i}"
        acc += tok or 0


def test_pack_sequences_layout_invariant(spark):
    rows = [(i, (i * 13) % 50 + 5) for i in range(120)]
    df1 = spark.createDataFrame(rows, "doc_id long, tokens long").repartition(1)
    df2 = spark.createDataFrame(rows[::-1], "doc_id long, tokens long").repartition(11)
    a = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
         for r in pack_training_sequences(df1, "doc_id", "tokens", 128).collect()}
    b = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
         for r in pack_training_sequences(df2, "doc_id", "tokens", 128,
                                          num_partitions=3).collect()}
    assert a == b


def test_line_dedup_rebuild_and_exemptions(spark):
    from datasketches_cpp_spark.operators.curation import line_dedup_stats

    hot = "SHARED BOILERPLATE LINE LONG ENOUGH"
    rows = [
        ("a", f"{hot}\nunique to a\n---"),
        ("b", f"{hot}\nunique to b\n---"),
        ("c", f"{hot}\nunique to c\n---"),
        ("d", f"{hot}\nunique to d\n---"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup_stats(
            df, "doc_id", "text", min_line_chars=8, max_doc_freq=2,
            rebuild_text=True,
        ).collect()
    }
    for d in "abcd":
        assert out[d]["n_lines"] == 3
        assert out[d]["n_dup_lines"] == 1  # the hot line; '---' exempt (short)
        assert out[d]["dedup_text"] == f"unique to {d}\n---"
    # doc_freq == max_doc_freq is NOT hot
    two = [("x", "SHARED BY EXACTLY TWO DOCUMENTS\nbody x"),
           ("y", "SHARED BY EXACTLY TWO DOCUMENTS\nbody y")]
    df2 = spark.createDataFrame(two, "doc_id string, text string")
    got = {r["doc_id"]: r["n_dup_lines"]
           for r in line_dedup_stats(df2, "doc_id", "text").collect()}
    assert got == {"x": 0, "y": 0}


def test_line_dedup_layout_invariant(spark):
    from datasketches_cpp_spark.operators.curation import line_dedup_stats

    rows = [(f"d{i}", "HOT COMMON LINE EVERYWHERE\n" + f"body {i}")
            for i in range(10)]
    a = {r["doc_id"]: (r["n_lines"], r["n_dup_lines"]) for r in line_dedup_stats(
        spark.createDataFrame(rows, "doc_id string, text string").repartition(1),
        "doc_id", "text").collect()}
    b = {r["doc_id"]: (r["n_lines"], r["n_dup_lines"]) for r in line_dedup_stats(
        spark.createDataFrame(rows[::-1], "doc_id string, text string").repartition(7),
        "doc_id", "text").collect()}
    assert a == b and all(v == (2, 1) for v in a.values())


def test_pii_stats_counts_redaction_and_plan(spark):
    from datasketches_cpp_spark.operators.curation import pii_stats

    rows = [
        ("p1", "mail a@b.com and c.d+x@e.org, ip 10.0.0.1, call +15550001111"),
        ("p2", "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           pii_stats(df, "doc_id", "text", redact=True).collect()}
    assert (out["p1"]["n_email"], out["p1"]["n_ipv4"], out["p1"]["n_phone_e164"]) == (2, 1, 1)
    assert (out["p2"]["n_email"], out["p2"]["n_ipv4"], out["p2"]["n_phone_e164"]) == (0, 0, 0)
    red = out["p1"]["redacted_text"]
    assert "a@b.com" not in red and "10.0.0.1" not in red and "+1555" not in red
    assert red.count("<PII>") == 4
    assert out["p2"]["redacted_text"] == rows[1][1]
    # zero-shuffle contract: one codegen projection, no exchange
    plan = (
        pii_stats(df, "doc_id", "text")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_line_dedup_broadcasts_hot_set(spark):
    """Scale contract: the corpus-sized line table must NOT shuffle for
    the hot-line join — the hot set broadcasts by default."""
    from datasketches_cpp_spark.operators.curation import line_dedup_stats

    rows = [(f"d{i}", "HOT LINE SHARED EVERYWHERE\nbody") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    plan = (
        line_dedup_stats(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # opt-out path stays available and agrees
    a = sorted(map(tuple, line_dedup_stats(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, line_dedup_stats(
        df, "doc_id", "text", broadcast_hot=False).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# CCNet-style bigram-LM perplexity (Wenzek et al. 2020 quality filter)
# ---------------------------------------------------------------------------


def _lm_py(corpus, alpha=0.1):
    """Hand-rolled add-alpha bigram LM twin of curation.ngram_lm_scores."""
    import collections
    import math
    import re

    tok = lambda t: [w for w in re.split(r"[^a-z]+", t.lower()) if w]
    ws = {d: tok(t) for d, t in corpus}
    ws = {d: w for d, w in ws.items() if len(w) >= 2}
    c12 = collections.Counter(
        (w[i], w[i + 1]) for w in ws.values() for i in range(len(w) - 1)
    )
    c1 = collections.Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    vocab = len({w for x in ws.values() for w in x})
    out = {}
    for d, w in ws.items():
        lps = [
            math.log((c12[(w[i], w[i + 1])] + alpha) / (c1[w[i]] + alpha * vocab))
            for i in range(len(w) - 1)
        ]
        out[d] = (len(lps), round(math.exp(-sum(lps) / len(lps)), 4))
    return c12, c1, vocab, out


def test_lm_perplexity_matches_python(spark, docs):
    from datasketches_cpp_spark.operators.curation import ngram_lm_scores

    corpus = [(r.doc_id, r.text) for r in docs.collect()]
    _, _, _, expect = _lm_py(corpus)
    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in ngram_lm_scores(docs, "doc_id", "text").collect()
    }
    assert got == expect  # doc 3 ("tiny") has < 2 words and is excluded


def test_lm_perplexity_external_lm_unseen_fallback(spark, docs):
    """Scoring a doc with bigrams absent from an external LM must follow the
    add-alpha law exactly: unseen (w1,w2) -> c12=0; unseen w1 -> c1=0."""
    import math

    from datasketches_cpp_spark.operators.curation import (
        ngram_lm_scores,
        train_bigram_lm,
    )

    lm = train_bigram_lm(docs, "text")
    vocab = lm[2].collect()[0].v
    probe = spark.createDataFrame(
        [(99, "qqq www qqq")], "doc_id long, text string"
    )
    [row] = ngram_lm_scores(probe, "doc_id", "text", lm=lm).collect()
    # both bigrams fully unseen: P = 0.1 / (0.1 * V) = 1 / V
    assert row.n_bigrams == 2
    assert row.ppl == round(math.exp(math.log(vocab)), 4) == round(float(vocab), 4)


def test_lm_perplexity_layout_invariant(spark, docs):
    from datasketches_cpp_spark.operators.curation import ngram_lm_scores

    a = sorted(
        map(tuple, ngram_lm_scores(docs, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            ngram_lm_scores(docs.repartition(7), "doc_id", "text").collect(),
        )
    )
    assert a == b


def test_lm_perplexity_low_quality_flag(spark, docs):
    """Repetitive text scores LOW ppl (predictable), shuffled-vocab text
    scores high; the flag thresholds raw (unrounded) ppl."""
    from datasketches_cpp_spark.operators.curation import ngram_lm_scores

    rows = {
        r.doc_id: r
        for r in ngram_lm_scores(
            docs, "doc_id", "text", ppl_threshold=5.0
        ).collect()
    }
    assert not rows[2].low_quality  # "spark spark spark..." is maximally predictable
    assert rows[2].ppl < rows[1].ppl  # unique-words doc is the least predictable


def test_mixing_weights_matches_python(spark):
    from datasketches_cpp_spark.operators.curation import mixing_weights

    rows = [("en", 600), ("en", 400), ("de", 300), ("zh", 100), ("xx", 50)]
    df = spark.createDataFrame(rows, "lang string, tokens long")
    targets = {"en": 0.6, "de": 0.3, "zh": 0.1}
    got = {
        r.lang: r
        for r in mixing_weights(
            df, "lang", "tokens", targets, budget_tokens=10_000
        ).collect()
    }
    total = 1450
    for lang, toks in [("en", 1000), ("de", 300), ("zh", 100), ("xx", 50)]:
        t = targets.get(lang, 0.0)
        r = got[lang]
        assert r.tokens == toks
        assert r.actual_share == round(toks / total, 6)
        assert r.target_share == t
        assert r.weight == round(t / (toks / total), 6)
        assert r.epochs_at_budget == round(10_000 * t / toks, 6)
    # upsampled low-resource group repeats: zh needs 10x its tokens
    assert got["zh"].epochs_at_budget == 10.0
    # group absent from targets is reported but weighted to zero
    assert got["xx"].weight == 0.0


def test_mixing_weights_one_shuffle(spark):
    from datasketches_cpp_spark.operators.curation import mixing_weights

    df = spark.createDataFrame(
        [("en", 10), ("de", 5)], "lang string, tokens long"
    )
    plan = (
        mixing_weights(df, "lang", "tokens", {"en": 1.0}, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the group agg is the only hash exchange; the total joins back broadcast
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan


def test_gopher_flags_rules(spark):
    from datasketches_cpp_spark.operators.curation import gopher_quality_flags

    good = (
        "the cat and dog have gone to the market of wonders "
        "that they be with joy today and more words here now"
    )
    rows = [
        (0, good),                                  # passes everything
        (1, "tiny doc"),                            # word count
        (2, "aa " * 20),                            # mean word length < 3
        (3, ("the of and " * 7) + "# # # # # # #"), # symbol ratio > 0.1
        (4, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # bullets
        (5, "the end...\nof the and...\nbe to have..."),          # ellipsis
        (6, ("1 2 3 4 5 6 7 8 9 10 " * 2) + "the of"),            # alpha
        (7, "zebra quantum flux " * 7),              # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in gopher_quality_flags(df, "text", min_words=10).collect()
    }
    assert out[0].gopher_keep
    assert not out[1].g_word_count
    assert not out[2].g_mean_wl
    assert not out[3].g_symbol_ratio
    assert not out[4].g_bullet_lines
    assert not out[5].g_ellipsis_lines
    assert not out[6].g_alpha_words
    assert not out[7].g_stopwords
    for d in range(1, 8):
        assert not out[d].gopher_keep


def test_gopher_flags_single_codegen_stage(spark):
    from datasketches_cpp_spark.operators.curation import gopher_quality_flags

    df = spark.createDataFrame([(0, "the of and")], "doc_id long, text string")
    plan = (
        gopher_quality_flags(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# --- leakage-safe splits + deterministic corpus shuffle (session 8) -------


def test_split_by_cluster_no_leakage_and_determinism(spark):
    from datasketches_cpp_spark.operators.curation import split_by_cluster

    # 40 clusters of 1-4 members each
    rows = [(cid * 10 + j, cid) for cid in range(40) for j in range(1 + cid % 4)]
    asg = spark.createDataFrame(rows, "id long, cluster_id long")
    out = split_by_cluster(asg, seed="t").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # leakage-safety: every cluster entirely inside ONE split
    assert all(len(s) == 1 for s in by_cluster.values())
    # determinism + layout invariance: identical on a reshuffled input
    again = split_by_cluster(
        asg.repartition(7), seed="t"
    ).collect()
    assert {(r["id"], r["split"]) for r in again} == {
        (r["id"], r["split"]) for r in out
    }
    # all three splits appear with default 90/5/5 over 40 clusters is not
    # guaranteed — but a different seed must re-roll at least one cluster
    other = split_by_cluster(asg, seed="t2").collect()
    assert {(r["id"], r["split"]) for r in other} != {
        (r["id"], r["split"]) for r in out
    }


def test_split_by_cluster_fractions_and_plan(spark):
    from datasketches_cpp_spark.operators.curation import split_by_cluster

    asg = spark.createDataFrame(
        [(i, i) for i in range(4000)], "id long, cluster_id long"
    )
    with pytest.raises(ValueError):
        split_by_cluster(asg, fractions={"a": 0.5, "b": 0.2})
    out = split_by_cluster(
        asg, fractions={"train": 0.8, "test": 0.2}, seed="f"
    )
    # zero-shuffle: a pure projection — no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(
        F.count("*").alias("c")).collect()}
    # 4000 singleton clusters: binomial(4000, .2) → ±5 sigma ≈ ±127
    assert abs(counts["test"] - 800) < 130
    assert counts["train"] + counts["test"] == 4000


def test_shuffle_corpus_matches_sql_twin_and_is_layout_invariant(spark):
    from datasketches_cpp_spark.operators.curation import shuffle_corpus

    df = spark.createDataFrame([(i,) for i in range(977)], "id long")
    got = {
        r["id"]: r["shuffle_pos"]
        for r in shuffle_corpus(df, "id", seed="s").collect()
    }
    # naive twin: global orderBy on the same key
    want = {
        r["id"]: i
        for i, r in enumerate(
            df.orderBy(
                F.substring(F.md5(F.concat_ws(":", F.lit("s"), "id")), 1, 8),
                "id",
            ).collect()
        )
    }
    assert got == want
    # a permutation: every position exactly once
    assert sorted(got.values()) == list(range(977))
    # layout invariance
    got2 = {
        r["id"]: r["shuffle_pos"]
        for r in shuffle_corpus(df.repartition(13), "id", seed="s").collect()
    }
    assert got2 == got
    # independent permutation under a different seed
    got3 = {
        r["id"]: r["shuffle_pos"]
        for r in shuffle_corpus(df, "id", seed="s2").collect()
    }
    assert got3 != got


def test_shuffle_corpus_no_global_window(spark):
    from datasketches_cpp_spark.operators.curation import shuffle_corpus

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    out = shuffle_corpus(df, "id", seed="w", materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window partitions by _pid (range-partition id), never by a
    # constant — a SinglePartition window would appear as an Exchange
    # SinglePartition feeding the Window
    assert "SinglePartition" not in plan
    out.sparkSession.catalog.clearCache()


def test_shuffle_corpus_empty_input(spark):
    from datasketches_cpp_spark.operators.curation import shuffle_corpus

    df = spark.createDataFrame([], "id long")
    out = shuffle_corpus(df, "id", seed="e")
    assert out.count() == 0
    assert "shuffle_pos" in out.columns


def test_line_dedup_sep_is_literal(spark):
    """sep is a literal separator, not a regex: '|' must split on pipes
    only (a regex alternation would split every character)."""
    from datasketches_cpp_spark.operators.curation import line_dedup_stats

    df = spark.createDataFrame(
        [(1, "alpha beta gamma|delta epsilon zeta"),
         (2, "alpha beta gamma|other line here"),
         (3, "alpha beta gamma|third body text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup_stats(
        df, "doc_id", "text", sep="|", min_line_chars=8, max_doc_freq=2
    ).collect()}
    assert all(r["n_lines"] == 2 for r in out.values())
    # 'alpha beta gamma' appears in 3 docs > max_doc_freq -> dup line
    assert all(r["n_dup_lines"] == 1 for r in out.values())
