"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row count, sorted column names, and an order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from iyp_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8)
    con = duckdb.connect()
    from iyp_spark.entry_queries import TABLES

    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  ~ {name}: rows-only check ({len(srows)} rows, {t_spark:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only)"))
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        dcols = rel.columns
        drows = rel.fetchall()
        t_duck = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            a = norm_rows(scols, [[row[c] for c in scols] for row in srows])
            b = norm_rows(dcols, drows)
            if a != b:
                diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
                diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
                problems.append(f"values differ; spark-only={diff_a} duck-only={diff_b}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  ✗ {name}: {problems}")
        else:
            print(f"  ✓ {name} ({len(srows)} rows, spark {t_spark:.1f}s, duck {t_duck:.2f}s)")

    print()
    if failures:
        print(f"FAILED: {len(failures)}")
        for n, p in failures:
            print(f"  {n}: {p}")
        sys.exit(1)
    print(f"ALL OK ({len([n for n in queries if not only or n in only])} queries)")


if __name__ == "__main__":
    main()
