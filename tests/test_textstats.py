

def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus built with word_i repeated floor(1000/i) times is Zipf
    with slope -1 by construction; the fit must recover it."""
    def name(i):
        a, b = divmod(i, 26)
        return "w" + chr(97 + a) + chr(97 + b)

    words = []
    for i in range(1, 101):
        words += [name(i)] * (1000 // i)
    docs = spark.createDataFrame(
        [(j, " ".join(words[j::7])) for j in range(7)],
        "doc_id long, text string",
    )
    [r] = (
        __import__(
            "datasketches_cpp_spark.operators.textstats",
            fromlist=["zipf_fit"],
        ).zipf_fit(docs, "text").collect()
    )
    assert r.n_types == 100
    assert r.n_tokens == sum(1000 // i for i in range(1, 101))
    assert abs(r.zipf_slope + 1.0) < 0.05
    assert r.zipf_r2 > 0.99


def test_zipf_fit_flat_for_uniform_vocab(spark):
    from datasketches_cpp_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(0, (" ".join("u" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(50)) + " ") * 4)],
        "doc_id long, text string",
    )
    [r] = zipf_fit(docs, "text").collect()
    assert abs(r.zipf_slope) < 1e-6  # perfectly uniform -> flat line


def test_token_count_null_text_is_zero(spark):
    from datasketches_cpp_spark.operators.textstats import with_token_count

    df = spark.createDataFrame(
        [(1, "two words"), (2, None), (3, "   ")], "id long, text string"
    )
    got = {r["id"]: r["token_count"]
           for r in with_token_count(df, "text").collect()}
    assert got == {1: 2, 2: 0, 3: 0}
