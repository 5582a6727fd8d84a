"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the same-named SQL on DuckDB over the same parquet tables;
compares row count, column names, and an order-insensitive value hash
(rows sorted, columns sorted by name, floats pre-rounded by the queries
themselves). Prints one line per query.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def _norm(v) -> str:
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from index_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    # per-entry driver provenance (tools/driver_rounds.py): the round in
    # which the DRIVER last recorded this entry green, 'never' if only
    # the local replica has covered it so far
    try:
        import json as _json
        with open("DRIVER_ROUNDS.json") as f:
            _rounds = _json.load(f)
    except OSError:
        _rounds = {}

    def prov(name: str) -> str:
        r = _rounds.get(name)
        if r is None:
            return ""
        return f"driver=r{r:02d}" if r else "driver=never"

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:24} spark error: {str(exc).splitlines()[0][:140]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"ROWS  {name:24} rows={len(spark_pdf):7d}  cols={list(spark_pdf.columns)}  {dt:5.1f}s  {prov(name)}")
            continue
        try:
            duck_pdf = con.sql(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:24} duckdb error: {str(exc).splitlines()[0][:140]}")
            n_fail += 1
            continue
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            problems.append(f"cols {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        else:
            hs, hd = value_hash(spark_pdf), value_hash(duck_pdf)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
        if problems:
            print(f"FAIL  {name:24} {'; '.join(problems)}  {dt:5.1f}s")
            n_fail += 1
        else:
            print(f"PASS  {name:24} rows={len(spark_pdf):7d}  {dt:5.1f}s  {prov(name)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(qs) - len(osql)} rows-only")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
