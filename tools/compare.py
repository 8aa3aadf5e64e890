#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare (dev tool only —
not part of the shipped library). Usage:

    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out

For each key in <outDir>/oracle_sql.json: run the SQL in DuckDB with views
over the sf parquet tables, read the Spark parquet dump, sort columns by
name, and diff row-by-row (exact for non-floats, tiny epsilon report for
floats so we can judge hash-match risk).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            oracle_df = con.sql(sql).df()
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            failures.append((name, f"load/run error: {e}"))
            continue
        o = oracle_df[sorted(oracle_df.columns)]
        s = spark_df[sorted(spark_df.columns)]
        if list(o.columns) != list(s.columns):
            failures.append((name, f"columns differ: oracle={list(o.columns)}"
                                   f" spark={list(s.columns)}"))
            continue
        if len(o) != len(s):
            failures.append((name, f"row count differs: oracle={len(o)}"
                                   f" spark={len(s)}"))
            continue
        bad = []
        for c in o.columns:
            ov, sv = o[c], s[c]
            if ov.dtype.kind == "f" or sv.dtype.kind == "f":
                import numpy as np
                ovn = ov.astype(float).to_numpy()
                svn = sv.astype(float).to_numpy()
                exact = np.array_equal(ovn, svn, equal_nan=True)
                if not exact:
                    close = np.allclose(ovn, svn, rtol=1e-12, equal_nan=True)
                    mism = int((~np.isclose(ovn, svn, rtol=1e-12,
                                            equal_nan=True)).sum())
                    bad.append(f"{c}: float not bit-exact"
                               f" ({'close' if close else f'{mism} off'})")
            else:
                if not ov.equals(sv):
                    n = int((ov.astype(str) != sv.astype(str)).sum())
                    bad.append(f"{c}: {n} rows differ")
        if bad:
            failures.append((name, "; ".join(bad)))
        else:
            print(f"  OK {name} ({len(o)} rows)")
    if failures:
        print("\nFAILURES:")
        for name, msg in failures:
            print(f"  FAIL {name}: {msg}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
