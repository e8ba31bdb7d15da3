"""Replicates the driver's correctness gate: for every queries() entry
with an oracle, run the Spark query AND the DuckDB SQL at sf=0.01 and
compare row count, column names, and order-insensitive values
(doubles canonicalized to 9 significant decimals)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"{type(v).__name__[:1]}:{v}"


def _rows_spark(df):
    cols = sorted(df.columns)
    return sorted(
        "|".join(_canon(r[c]) for c in cols) for r in df.collect()
    ), cols


def _rows_duck(con, sql):
    cur = con.sql(sql)
    names = cur.columns
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    ), sorted(names)


QUERY_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got, got_cols = _rows_spark(q(spark, SF_DIR))
    want, want_cols = _rows_duck(ddb, sql)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), (
        f"{name}: rows {len(got)} != {len(want)}\n"
        f"spark sample: {got[:3]}\nduck sample: {want[:3]}"
    )
    mism = [
        (a, b) for a, b in zip(got, want) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatches; first: {mism[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["node_id", "rank"]


def test_rows_only_queries_run(spark):
    for name in set(entry_mod.queries()) - set(entry_mod.oracle_sql()):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() >= 0, name
