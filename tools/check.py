#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against views over the sf_dir
parquet tables, then compares: row count, column names (sorted), and a hash
of the values with columns sorted by name and rows sorted by all columns.
Mirrors the driver's described compare (sort columns by name before hashing
values). Exit code = number of mismatching queries.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: timestamps -> iso strings, floats stay floats
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    fails = 0
    names = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(d))
    # a query that threw in Verify leaves NO output dir — without this it
    # would vanish from the report entirely instead of failing loudly
    for name in sorted(set(oracles) - set(names)):
        print(f"FAIL {name}: declared oracle but no Verify output (query threw?)")
        fails += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            fails += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails += 1
            continue
        # exact compare first; fall back to tolerant float compare to
        # distinguish "ulp noise" from real mismatches
        eq = got.equals(exp)
        if not eq:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-12)
                print(f"WARN {name}: matches only with float tolerance "
                      f"(driver may hash-mismatch) rows={len(got)}")
                fails += 1
                continue
            except AssertionError as e:
                msg = str(e).splitlines()[0]
                print(f"FAIL {name}: value mismatch: {msg}")
                diff = (got != exp) & ~(got.isna() & exp.isna())
                badcols = [c for c in got.columns if diff[c].any()]
                for c in badcols[:3]:
                    i = diff[c].idxmax()
                    print(f"  col {c} row {i}: got={got[c][i]!r} exp={exp[c][i]!r}")
                fails += 1
                continue
        print(f"PASS {name} rows={len(got)}")
    return fails


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
