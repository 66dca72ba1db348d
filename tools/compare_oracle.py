#!/usr/bin/env python3
"""Local replay of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dataset (graft.Verify dump),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the raw testdata parquet, and compares values with columns sorted by
name and rows sorted by all columns (mirrors the driver's hash compare).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # No bytes/bytearray coercion on purpose: the driver's compare sorts
    # raw values, so binary/array columns must not reach this layer at all
    # (round-1 lesson — queries emit hex/quantized scalars instead).
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, ignore_index=True)
    return df


def norm(v):
    try:
        import pandas as pd
        if v is None or (not isinstance(v, (list, tuple)) and pd.isna(v)):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return round(v, 6)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expect = canon(con.sql(sql).df())
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        dt_mismatch = [(c, str(got[c].dtype), str(expect[c].dtype))
                       for c in expect.columns
                       if str(got[c].dtype) != str(expect[c].dtype)]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch {dt_mismatch}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        ev = [[norm(v) for v in row] for row in expect.itertuples(index=False)]
        gv = [[norm(v) for v in row] for row in got.itertuples(index=False)]
        if ev != gv:
            bad = next(i for i, (a, b) in enumerate(zip(ev, gv)) if a != b)
            print(f"FAIL {name}: first diff row {bad}: spark={gv[bad]} duck={ev[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    import os
    # only DIRECTORIES count (stray files like .crc are not dumps), and a
    # broken/partial dump must FAIL, not crash the summary away
    dumped = {d for d in os.listdir(out_dir)
              if not d.endswith(".json") and os.path.isdir(os.path.join(out_dir, d))}
    rows_only = dumped - set(oracle)
    # Every deliberately rows-only query must be enumerated here; a dump
    # dir that is neither oracle-checked nor allowlisted is a STALE
    # leftover from a previous run (renamed/removed query, or a VerifySome
    # subset overwrote oracle_sql.json) and must FAIL, not silently count
    # as a rows-only PASS standing in for an oracle check.
    ROWS_ONLY_EXPECTED = set()
    for name in sorted(rows_only - ROWS_ONLY_EXPECTED):
        print(f"FAIL {name}: dump dir has no oracle entry and is not an "
              f"allowlisted rows-only query — stale leftover?")
        n_fail += 1
    rows_only &= ROWS_ONLY_EXPECTED
    for name in sorted(rows_only):
        try:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            ok = n > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {n} rows)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name} (rows-only: unreadable dump: {e})")
            continue
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
