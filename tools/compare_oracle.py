#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the
fixture tables registered as views, sorts columns by name, and compares
values exactly (rows compared both order-sensitively and after a stable
sort, so we know which guarantee we meet).

This script is a local development tool only — the shipped library is
pure Scala/Spark.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # Decimal -> str for exact compare
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(s.dtype):
            df[c] = s.astype("datetime64[us]")
        elif str(s.dtype) in ("int8", "int16", "int32", "uint32"):
            df[c] = s.astype("int64")
        elif str(s.dtype) == "float32":
            df[c] = s.astype("float64")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)],
                        ignore_index=True) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: rows={len(got)}")
            n_noora += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"  [FAIL-cols] {name}: got {list(g.columns)} vs "
                  f"oracle {list(e.columns)}")
            n_fail += 1
            continue
        ordered = g.shape == e.shape and g.equals(e)
        if ordered:
            print(f"  [PASS     ] {name}: rows={len(g)} (exact, ordered)")
            n_pass += 1
            continue
        gs = g.sort_values(by=list(g.columns), kind="mergesort",
                           na_position="first").reset_index(drop=True)
        es = e.sort_values(by=list(e.columns), kind="mergesort",
                           na_position="first").reset_index(drop=True)
        if gs.shape == es.shape and gs.equals(es):
            print(f"  [PASS-sort] {name}: rows={len(g)} "
                  f"(match only after row sort — check ORDER BY!)")
            n_pass += 1
        else:
            print(f"  [FAIL     ] {name}: got {g.shape} vs oracle {e.shape}")
            if g.shape == e.shape:
                neq = (gs != es) & ~(gs.isna() & es.isna())
                bad = neq.any(axis=0)
                for c in gs.columns[bad][:4]:
                    i = neq[c].idxmax()
                    print(f"      col {c} row {i}: "
                          f"got={gs[c][i]!r} oracle={es[c][i]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
