"""Local replica of the driver's t2 correctness gate.

For each queries() entry: run the Spark DataFrame and (if present) the
oracle SQL in DuckDB over the same sf dir; compare row count, sorted
column names, and an order-insensitive multiset of stringified rows.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from big_data_hdfs_ray_vs_spark_spark.schemas import TESTDATA_TABLES

import __spark_entry__ as entrymod


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # Mimic a hash on rounded display values.
        return f"{v:.10g}"
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # DEFAULT session on purpose — no engine confs. This replicates the
    # driver's harness condition (it builds its own SparkSession), so any
    # query that silently depends on session.py's confs fails HERE first.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # A typo'd name would otherwise match nothing and the gate
        # would print ALL OK over zero queries — a silent false pass.
        print(f"ERROR: unknown queries: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Cache isolation between queries (mirrors bench.py), at the
        # TOP of the iteration so error paths can't skip it: persisted
        # results from iterative plans otherwise accumulate for the
        # whole 100-query run.
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"[FAIL] {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception:
            print(f"[FAIL] {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"[FAIL] {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"[FAIL] {name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            ms, mo = row_multiset(scols, srows), row_multiset(ocols, orows)
            if ms != mo:
                diffs = [(a, b) for a, b in zip(ms, mo) if a != b][:5]
                print(f"[FAIL] {name}: value mismatch; first diffs: {diffs}")
                ok = False
        if ok:
            print(f"[OK] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
