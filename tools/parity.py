#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over the sfDir parquet tables, read the Spark result parquet, sort
columns by name, and compare cell-by-cell (exact for ints/strings,
bit-equal for floats — mirroring a hash compare).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            # Driver fetchdf renders HUGEINT (bare SUM of BIGINT) and
            # DECIMAL as float64 -> hash diverges from Spark's int64 even
            # when values are identical (r6 q207/q226/q238/q243). Fail
            # loudly on the TYPE, not just the values.
            bad_types = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                         if "HUGEINT" in str(t).upper()
                         or "DECIMAL" in str(t).upper()]
            if bad_types:
                print(f"FAIL {name}: oracle emits HUGEINT/DECIMAL columns "
                      f"{bad_types} — CAST them to BIGINT in the SQL")
                n_fail += 1
                continue
            want = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        diffs = []
        for c in want.columns:
            wv, gv = want[c].values, got[c].values
            for i in range(len(wv)):
                a, b = wv[i], gv[i]
                if pd.isna(a) and pd.isna(b):
                    continue
                if pd.isna(a) != pd.isna(b) or a != b:
                    diffs.append((c, i, a, b))
                    if len(diffs) >= 3:
                        break
            if len(diffs) >= 3:
                break
        if diffs:
            print(f"FAIL {name}: {len(diffs)}+ diffs, first: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
