"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count + column names + order-insensitive value hash.

Usage: python scripts/oracle_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9) + 0.0)  # +0.0 folds -0.0 into 0.0
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from darkbo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir("/tmp/oracle_ckpt")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    import re as _re

    for name, fn in qs.items():
        if name_filter and not _re.search(name_filter, name):
            continue
        try:
            df = fn(spark, sf_dir)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            if len(srows) == 0:
                # a regression that empties an operator must not pass green
                print(f"FAIL  {name}: rows-only query returned 0 rows")
                failed.append(name)
            else:
                print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failed.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = value_hash(srows, scols) == value_hash(drows, dcols)
        status = "OK   " if (ok_count and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: spark={len(srows)} duck={len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'}"
        )
        if not (ok_count and ok_cols and ok_hash):
            failed.append(name)
            if ok_cols:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("|".join(norm_cell(r[i]) for i in order) for r in srows)
                d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
                d_set = sorted("|".join(norm_cell(r[i]) for i in d_order) for r in drows)
                only_s = [x for x in s_set if x not in set(d_set)][:3]
                only_d = [x for x in d_set if x not in set(s_set)][:3]
                print(f"       only-spark: {only_s}")
                print(f"       only-duck:  {only_d}")
    print(f"\n{len(failed)} failures: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
