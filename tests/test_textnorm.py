"""Text canonicalization tests: hand-written folding cases, Spark vs
DuckDB twin agreement (the oracle emitter shares its constants with the
Catalyst expression), dedup-stats semantics, and plan shape (no UDF,
partial aggregation before the exchange)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datasketches_cpp_spark.operators.textnorm import (
    ACCENT_DST,
    ACCENT_SRC,
    canonical_dedup_stats,
    normalized_text,
    sql_normalized_text,
)

CASES = [
    ("Café  Noir!", "cafe noir"),
    ("CAFE   noir", "cafe noir"),
    ("naïve—déjà vu", "naive deja vu"),
    ("  Größe,  Straße  ", "grose strase"),  # 1:1 translate: ß -> s
    ("ŁÓDŹ, śląski", "lodz slaski"),
    ("hello world", "hello world"),
    ("!!!", ""),
    ("日本語テキスト!", "日本語テキスト"),  # \p{L} keeps non-Latin scripts
    ("a\tb\nc", "a b c"),
    ("ümlaut ÜMLAUT", "umlaut umlaut"),
]


def test_tables_aligned():
    assert len(ACCENT_SRC) == len(ACCENT_DST)
    assert len(set(ACCENT_SRC)) == len(ACCENT_SRC)


def test_hand_cases_spark(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "s string")
    got = [r[0] for r in df.select(normalized_text("s")).collect()]
    assert got == [want for _, want in CASES]


def test_duckdb_twin_agrees(spark):
    """The SQL emitted by sql_normalized_text must produce byte-identical
    results to the Catalyst expression on every case — the property the
    driver oracle relies on."""
    con = duckdb.connect()
    for s, want in CASES:
        lit = "'" + s.replace("'", "''") + "'"
        assert con.execute(
            "select " + sql_normalized_text(lit)
        ).fetchone()[0] == want, s


def test_regex_whitespace_chars(spark):
    """Tabs/newlines are punctuation-class (not \\p{L}\\p{N} or space) so
    they become spaces, then collapse — in BOTH engines."""
    s = "x\t\ty\n\nz\r"
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(normalized_text("s")).collect()[0][0]
    con = duckdb.connect()
    oracle = con.execute(
        "select " + sql_normalized_text("'" + s.replace("\r", chr(13)) + "'")
    ).fetchone()[0]
    assert got == oracle == "x y z"


def test_canonical_dedup_stats(spark):
    rows = [
        (1, "Café Noir!"),
        (2, "cafe   noir"),
        (3, "CAFE-NOIR"),
        (4, "something else"),
        (5, "Something ELSE."),
        (6, "unique text"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = canonical_dedup_stats(df, "id", "text").toPandas()
    by_canon = {int(r.canonical_id): int(r.n_copies) for r in out.itertuples()}
    assert by_canon == {1: 3, 4: 2, 6: 1}


def test_plan_no_udf_partial_agg(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = canonical_dedup_stats(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation must run before the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange") or \
        plan.count("HashAggregate") >= 2
