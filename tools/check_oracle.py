#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sf tables, sorts columns by name, sorts rows, and compares values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

DuckDB-version sensitivity: a local PASS does not guarantee a driver-side
PASS if the oracle SQL leaves any floating-point evaluation order to the
engine — round 10's q_random_proj was red on the driver's gate while green
on local duckdb 1.0.0 because a plain sum() GROUP BY summed doubles in an
engine/version-dependent order and a last-ulp difference flipped a rounded
digit. Oracle SQL must pin float summation order (list_aggregate(list(x
ORDER BY k), 'sum')) and quantise doubles identically on both sides
(floor(v*1e4+0.5)/1e4) BEFORE any narrowing cast. This script prints the
local duckdb version so the assumption is recorded with every run.
"""
import json
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalise -0.0
        return v
    return v


def main(sf_dir, out_dir):
    print(f"duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # multi-file dataset (e.g. the scaled corpus)
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            def sort_key(row):
                return tuple((v is None, str(type(v)), v if v is not None else 0)
                             for v in row)
            got_rows = sorted(
                (tuple(canon(v) for v in row)
                 for row in con.sql(
                    "SELECT " + ", ".join(f'"{c}"' for c in got_cols)
                    + f" FROM '{out_dir}/{name}/*.parquet'").fetchall()),
                key=sort_key)
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = sorted(
                (tuple(canon(v) for v in row)
                 for row in con.sql(
                    "SELECT " + ", ".join(f'"{c}"' for c in want_cols)
                    + f" FROM ({sql})").fetchall()),
                key=sort_key)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
        elif got_rows != want_rows:
            bad = sum(1 for a, b in zip(got_rows, want_rows) if a != b)
            ex = next((a, b) for a, b in zip(got_rows, want_rows) if a != b)
            print(f"FAIL {name}: {bad}/{len(got_rows)} mismatched rows; "
                  f"first diff got={ex[0]} want={ex[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
