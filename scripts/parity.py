"""Local replica of the driver's correctness gate.

Runs every ``dq.queries.QUERIES`` entry on Spark and, where an oracle
exists, the matching SQL on DuckDB over the same parquet tables; compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified). Exit 0 iff everything
matches.

CRITICAL: both sides are materialized through PANDAS (``sdf.toPandas()``
and ``con.execute(sql).df()``) because that is how the driver does it —
a DuckDB HUGEINT (the result type of ``sum()`` over integers) lands as
float64 via ``.df()`` ('123.0') while a BIGINT lands as int64 ('123'),
so comparing ``fetchall()`` Python ints would hide exactly the dtype
artifacts the driver's value-hash trips on (round-1 VERDICT §wrong-2).

Usage:  python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from dq.queries import (  # noqa: E402
    _GATE_EMBEDDINGS_N,
    _near_dup_oracle_sql,
    ivf_oracle_sql,
    ORACLES,
    QUERIES,
    TABLES,
)
from dq.session import get_spark  # noqa: E402
from dq.similarity import near_dup_band_params  # noqa: E402


def canon(val):
    """Stringify one pandas-materialized value the way the driver's
    order-insensitive hash sees it (numpy scalars included)."""
    if val is None or val is pd.NaT:
        return "NULL"
    if isinstance(val, (bool, np.bool_)):
        return "true" if bool(val) else "false"
    if isinstance(val, (float, np.floating)):
        f = float(val)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(val, np.integer):
        return str(int(val))
    # normalize date-vs-midnight-timestamp (Spark DateType materializes
    # as datetime.date objects, DuckDB DATE as datetime64 — the driver's
    # hash treats these as equal per round-1 results)
    s = str(val)
    if isinstance(val, (pd.Timestamp,)) or "datetime" in type(val).__name__:
        if s.endswith(" 00:00:00"):
            return s[:-9]
    return s


def pdf_key(pdf: pd.DataFrame) -> tuple:
    """(sorted column names, sorted canonical rows) for a pandas frame."""
    cols = sorted(pdf.columns)
    body = sorted(
        tuple(canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None))
    return tuple(cols), body


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracles = dict(ORACLES)
    # embedding_near_dup auto-sizes its banding to the corpus count; the
    # committed oracle string is generated at the driver-gate size
    # (sf0.01). At any other scale, regenerate it at the size the Spark
    # query will pick, instead of emitting a misleading FAIL (ADVICE r4).
    n_emb = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    if n_emb != _GATE_EMBEDDINGS_N and "embedding_near_dup" in oracles:
        oracles["embedding_near_dup"] = _near_dup_oracle_sql(
            *near_dup_band_params(n_emb))
        print(f"note  embedding_near_dup oracle regenerated for "
              f"{n_emb} vectors (gate size is {_GATE_EMBEDDINGS_N})")
    # the IVF oracle embeds data-dependent centroid literals — always
    # generated at comparison time from this sf_dir's parquet
    oracles["embedding_ivf_topk"] = ivf_oracle_sql(sf_dir)

    failures = []
    ran = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(spdf)} rows)")
            if len(spdf) == 0 and name != "simhash_pairs":
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"FAIL  {name}: oracle error {exc}")
            continue
        sk, sb = pdf_key(spdf)
        ok_, ob = pdf_key(opdf)
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
            sdt = {c: str(spdf[c].dtype) for c in spdf.columns}
            odt = {c: str(opdf[c].dtype) for c in opdf.columns}
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL  {name}: first diffs {diff}\n"
                  f"      spark dtypes  {sdt}\n"
                  f"      oracle dtypes {odt}")
            continue
        print(f"ok    {name}: {len(sb)} rows exact-match")

    print(f"\n{ran - len(failures)}/{ran} pass"
          + ("" if ran == len(QUERIES) else
             f" (subset; catalog has {len(QUERIES)})"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
