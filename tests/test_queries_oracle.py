"""Every registered query vs its DuckDB oracle at sf0.001 — the in-repo
mirror of the driver's t2 gate (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import math

import duckdb
import pytest

from spark_sql_custom_mq_datasource_spark import TABLES
from spark_sql_custom_mq_datasource_spark.plans.registry import QUERIES, get_queries


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return "∅" if v is None else str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


_ALL = sorted(get_queries())


@pytest.mark.parametrize("name", _ALL)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    if q.oracle is None:
        assert len(srows) >= 0  # rows-only contract: must run
        return
    res = duck.execute(q.oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(df.columns) == sorted(dcols), "column names must match"
    assert len(srows) == len(drows), "row counts must match"
    assert _canon(srows, df.columns) == _canon(drows, dcols)
