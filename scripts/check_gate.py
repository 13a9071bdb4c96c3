"""Local stand-in for the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, schema width, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ONLY = sys.argv[1:] if len(sys.argv) > 1 else None


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in idx))
    return sorted(out), [cols[i] for i in idx]


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from bright_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("gate_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        sn, scn = norm_rows(scols, srows)
        on, ocn = norm_rows(ocols, orows)
        if scn != ocn:
            failures.append((name, f"schema: {scn} vs {ocn}"))
            print(f"FAIL {name}: schema {scn} vs {ocn}")
            continue
        if len(sn) != len(on):
            failures.append((name, f"rowcount {len(sn)} vs {len(on)}"))
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(on)}")
            continue
        if sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:5]
            failures.append((name, f"values: {diff}"))
            print(f"FAIL {name}: first diffs {diff}")
            continue
        print(f"ok   {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
