"""Driver-contract rehearsal: run every queries()[name] on Spark and its
oracle_sql()[name] on DuckDB over the same sf0.01 parquet, compare
row-count + column names + order-insensitive values — the same comparison
the driver's CORRECTNESS gate performs."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entry_mod.oracle_sql()[name])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sn, dn = _normalize(srows, scols), _normalize(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(sn, dn)) if x != y][:5]
    assert sn == dn, f"{name}: first diffs at {mism}: " + "; ".join(
        f"spark={sn[i]} duck={dn[i]}" for i in mism
    )


def test_rows_only_queries_run(spark):
    """Queries without oracles must still run and return rows."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "cluster_id"}
