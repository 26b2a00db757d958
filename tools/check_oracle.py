#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify output against DuckDB oracles: for each query dir under
OUT_DIR, loads <name>/*.parquet (our engine's result) and runs
oracle_sql.json[name] in DuckDB with views over SF_DIR/*.parquet, then
compares row-sorted, float-canonicalized results.

Usage: python3 tools/check_oracle.py OUT_DIR SF_DIR
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    rows_only_why = {}
    ro_path = f"{out_dir}/rows_only.json"
    if os.path.exists(ro_path):
        with open(ro_path) as f:
            rows_only_why = json.load(f)
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  FAIL {name}: no output parquet")
            n_fail += 1
            continue
        mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        mcols, mrows = mine.columns, mine.fetchall()
        if name not in oracles:
            why = rows_only_why.get(name)
            tag = f" — {why}" if why else ""
            if rows_only_why and not why:
                # an undeclared oracle-less query is a registry bug, not
                # a documented estimator (only enforced when the sidecar
                # exists — pre-r16 output dirs have none)
                print(f"  FAIL {name}: no oracle and no rows_only rationale")
                n_fail += 1
                continue
            print(f"  rows-only {name}: {len(mrows)} rows{tag}")
            n_rowsonly += 1
            continue
        try:
            ora = con.sql(oracles[name])
            ocols, orows = ora.columns, ora.fetchall()
        except Exception as e:
            print(f"  FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if sorted(mcols) != sorted(ocols):
            print(f"  FAIL {name}: columns {sorted(mcols)} != {sorted(ocols)}")
            n_fail += 1
            continue
        mk, ok = rows_key(mcols, mrows), rows_key(ocols, orows)
        if mk == ok:
            print(f"  PASS {name} ({len(mrows)} rows)")
            n_pass += 1
        else:
            print(f"  FAIL {name}: rows {len(mrows)} vs {len(orows)}")
            diff = [(a, b) for a, b in zip(mk, ok) if a != b][:3]
            for a, b in diff:
                print(f"    mine:   {a}\n    oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
