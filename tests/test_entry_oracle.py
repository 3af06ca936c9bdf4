"""Mirror of the driver's correctness gate: every ``queries()`` entry
runs on Spark AND as its ``oracle_sql()`` on DuckDB at sf0.001; values
compare order-insensitively with columns sorted by name (same protocol
as CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import importlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

entry_mod = importlib.import_module("__spark_entry__")


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _normalize(rows, cols):
    cols = sorted(cols)
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            if v != v:  # NaN → None
                v = None
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"doc_id", "offset", "kind", "text", "media_ref"} <= set(df.columns)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, oracle, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL op)
        return
    pdf = oracle.execute(sql).fetch_df()
    want = _normalize(
        pdf.to_dict("records"), list(pdf.columns)
    )
    got = _normalize(spark_rows, sdf.columns)
    assert sorted(sdf.columns) == sorted(pdf.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert got == want, f"{name}: value mismatch"
