"""Local replica of the driver's CORRECTNESS gate.

Runs every `__spark_entry__.queries()` entry on Spark AND its
`oracle_sql()` DuckDB mirror at a given scale factor, compares
row count, schema (column names sorted), and a canonical value hash
(columns sorted by name, rows sorted by their full stringified tuple
— the driver's documented protocol).  Queries with no oracle entry
get the weaker rows-only check, exactly like the driver.

Usage:  python jobs/oracle_sweep.py [sf_dir] [query ...]
        (default sf_dir /root/testdata/sf0.01; no query args = all)
"""
from __future__ import annotations

import hashlib
import json
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        # driver-style float canonicalization: round-trip via repr of
        # a 12-significant-digit round, so 1e-12 engine jitter ties
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from zhtml_spark.pipeline import build_session

    spark = build_session("oracle-sweep", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark err: {e}"))
            print(f"{name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"oracle err: {e}"))
            print(f"{name}: ORACLE ERROR {e}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and _hash(srows, scols) == _hash(orows, ocols)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
        if status == "FAIL":
            bad.append((name, "mismatch"))
    spark.stop()
    print(json.dumps({"bad": bad}))
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
