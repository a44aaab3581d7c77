"""Local replica of the driver's correctness gate.

Runs every ``dq.queries.QUERIES`` entry on Spark and, where an oracle
exists, the matching SQL on DuckDB over the same parquet tables; compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified). Exit 0 iff everything
matches.

Usage:  python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from dq.queries import ORACLES, QUERIES, TABLES  # noqa: E402
from dq.session import get_spark  # noqa: E402


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    return str(val)


def frame_key(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    body = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return tuple(names), body


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error {exc}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0 and name != "simhash_pairs":
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"FAIL  {name}: oracle error {exc}")
            continue
        sk, sb = frame_key(scols, srows)
        ok_, ob = frame_key(ocols, orows)
        if sk != ok_:
            failures.append((name, f"schema {sk} vs {ok_}"))
            print(f"FAIL  {name}: columns {sk} vs {ok_}")
            continue
        if len(sb) != len(ob):
            failures.append((name, f"rows {len(sb)} vs {len(ob)}"))
            print(f"FAIL  {name}: rowcount {len(sb)} vs {len(ob)}")
            continue
        if sb != ob:
            diff = [(a, b) for a, b in zip(sb, ob) if a != b][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL  {name}: first diffs {diff}")
            continue
        print(f"ok    {name}: {len(sb)} rows exact-match")

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
