"""Proof that the r6 pagerank/ppr oracle fix is a pure TYPE cast.

Runs the round-start ("old") and fixed ("new") oracle SQL for
graph_pagerank / graph_pagerank_weighted / graph_ppr in DuckDB over
the same SF dir and asserts row-for-row VALUE equality; prints the
fetched pandas dtypes showing float64 (old, HUGEINT fetch) vs int64
(new).  The Spark side is untouched by the fix, so value equality here
plus the (already hash-verified at the value level, VERDICT r5)
Spark↔oracle parity proves the result set is unchanged.
"""

import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as em  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

NEW = {
    "graph_pagerank": em._pagerank_oracle_sql(5),
    "graph_pagerank_weighted": em._pagerank_weighted_oracle_sql(5),
    "graph_ppr": em._ppr_oracle_sql(5),
}

con = duckdb.connect()
con.execute(
    f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
)

for name, new_sql in NEW.items():
    fixed_line = new_sql.splitlines()[-1]
    assert fixed_line.startswith("SELECT node, CAST(rank_int AS BIGINT)"), fixed_line
    old_sql = "\n".join(new_sql.splitlines()[:-1] + [
        fixed_line.replace("CAST(rank_int AS BIGINT) AS rank_int", "rank_int")
    ])
    old = con.execute(old_sql).df()
    new = con.execute(new_sql).df()
    assert list(old.columns) == list(new.columns) == ["node", "rank_int"]
    o = sorted(map(tuple, old.itertuples(index=False)))
    n = sorted(map(tuple, new.itertuples(index=False)))
    assert len(o) == len(n), (name, len(o), len(n))
    bad = [(a, b) for a, b in zip(o, n) if a[0] != b[0] or int(a[1]) != int(b[1])]
    assert not bad, (name, bad[:3])
    print(f"{name}: {len(o)} rows VALUE-IDENTICAL; "
          f"old dtype={old['rank_int'].dtype} -> new dtype={new['rank_int'].dtype}")
print("OK: the oracle change is a pure representation cast at", SF_DIR)
