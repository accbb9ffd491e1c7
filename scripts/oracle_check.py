#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata table exposed as a view), sort columns by name, and compare
values row-by-row (exact; floats compared exactly first, with a 1e-9
relative fallback reported separately).

This script is NOT part of the shipped engine — it pre-validates
oracle parity so the driver's t2 gate passes first try.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    rows_only = []
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_tbl = pq.read_table(str(qdir)).to_pandas()
        if name not in oracle:
            rows_only.append((name, len(spark_tbl)))
            continue
        try:
            duck = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_tbl.columns), sorted(duck.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s = spark_tbl[s_cols]
        d = duck[d_cols]
        if len(s) != len(d):
            print(f"FAIL {name}: rowcount spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in s.itertuples(index=False)]
        drows = [tuple(norm(v) for v in r) for r in d.itertuples(index=False)]
        exact = srows == drows
        if exact:
            n_pass += 1
            print(f"PASS {name} ({len(s)} rows)")
            continue
        # find first diff
        close = True
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                for x, y in zip(a, b):
                    if x != y:
                        if (isinstance(x, float) and isinstance(y, float)
                                and math.isclose(x, y, rel_tol=1e-9)):
                            continue
                        close = False
                        print(f"FAIL {name}: row {i} spark={a} duck={b}")
                        break
                if not close:
                    break
        if close:
            print(f"NEAR {name}: values differ only within 1e-9 "
                  f"(NOT hash-safe!)")
            n_fail += 1
        else:
            n_fail += 1
    for name, n in rows_only:
        print(f"ROWS-ONLY {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
