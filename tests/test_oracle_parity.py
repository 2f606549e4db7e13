"""Replicates the driver's DuckDB-oracle comparison locally at
sf0.001: row-count, column names, order-insensitive value equality,
AND fetched-representation dtype equality for every
queries()/oracle_sql() pair.

The dtype leg is the r5 VERDICT #2 fix: the driver hashes the fetched
pandas REPRESENTATION, so a DuckDB ``SUM(BIGINT)`` → HUGEINT →
float64 promotion hash-fails even when every value is identical
(85 == 85.0 passed the old value-only compare while the driver's hash
failed on graph_pagerank).  Comparing ``duckdb.df()`` dtypes against
``toPandas()`` dtypes makes the local test a faithful mirror.
Datetime unit differences (ns vs us) are normalized — they are fetch-
library artifacts, not representation divergence the driver hashes.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_GATE = "/root/testdata/sf0.01"  # the driver's larger gate SF
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck_for(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def duck():
    return _duck_for(SF_DIR)


@pytest.fixture(scope="module")
def duck_gate():
    return _duck_for(SF_DIR_GATE)


def _norm_dtype(dt):
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def _assert_dtypes_match(name, sdf, duck_res):
    # full fetches on BOTH sides: NULL-bearing int columns surface as
    # float64 in pandas from either engine (asof_join), and that
    # agreement is exactly what the driver's representation hash sees —
    # a limit(0) Spark fetch would under-report it as int64
    d_pd = duck_res.df()
    s_pd = sdf.toPandas()
    d_t = [_norm_dtype(t) for t in d_pd.dtypes]
    s_t = [_norm_dtype(t) for t in s_pd.dtypes]
    assert d_t == s_t, (
        f"{name}: fetched dtype mismatch (driver hashes representations) "
        f"oracle={list(zip(d_pd.columns, d_t))} spark={list(zip(s_pd.columns, s_t))}"
    )
    return d_pd


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(rows):
    return sorted(tuple(_norm(x) for x in r) for r in rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _check_parity(spark, con, name, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    # dtype leg: a separate execute — .df() consumes the cursor
    _assert_dtypes_match(name, sdf, con.execute(ORACLES[name]))
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    s_rows = _rows([tuple(r) for r in sdf.collect()])
    d_rows = _rows(res.fetchall())
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{s_rows[mism[0]]} vs {d_rows[mism[0]]}"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    _check_parity(spark, duck, name, SF_DIR)


@pytest.mark.parametrize(
    "name", sorted(n for n in ORACLES if n.startswith("graph_")))
def test_oracle_parity_graph_gate_sf(spark, duck_gate, name):
    """Graph-kernel parity AT the driver's larger gate SF (sf0.01) —
    the SF where CORRECTNESS_r05 graded the pagerank rows (r5 VERDICT
    #2: parity must run where the driver grades)."""
    _check_parity(spark, duck_gate, name, SF_DIR_GATE)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
