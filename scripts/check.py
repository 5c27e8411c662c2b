#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Runs every SQL in <verifyOutDir>/oracle_sql.json against DuckDB views over
the sfDir parquet tables, reads the Spark result parquet written by
graft.Verify, sorts columns by name and rows by all columns, and compares
cell-by-cell (exact for non-floats, 1e-9 relative for floats — the driver
hashes exactly, so any float diff is reported loudly).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalized(con, rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        spark_glob = str(Path(out_dir, name, "*.parquet"))
        if not list(Path(out_dir, name).glob("*.parquet")):
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            want = normalized(con, con.sql(oracle[name]))
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        got = normalized(con, con.sql(f"SELECT * FROM read_parquet('{spark_glob}')"))
        errs = []
        if list(want.columns) != list(got.columns):
            errs.append(f"columns want={list(want.columns)} got={list(got.columns)}")
        elif len(want) != len(got):
            errs.append(f"rows want={len(want)} got={len(got)}")
        else:
            for col in want.columns:
                for i, (a, b) in enumerate(zip(want[col], got[col])):
                    if isinstance(a, float) and isinstance(b, float):
                        # NaN == NaN here: the driver compares stringified
                        # values ("nan" == "nan"), so a NaN-vs-NaN cell is
                        # a match, not a diff
                        if a != b and not (math.isnan(a) and math.isnan(b)):
                            tag = "EXACT-DIFF" if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12) else "DIFF"
                            errs.append(f"{tag} {col}[{i}]: want={a!r} got={b!r}")
                    elif a != b and str(a) != str(b):
                        errs.append(f"DIFF {col}[{i}]: want={a!r} got={b!r}")
                    if len(errs) > 5:
                        break
                if len(errs) > 5:
                    break
        if errs:
            n_bad += 1
            print(f"MISMATCH {name} ({len(want)} rows): " + "; ".join(errs[:6]))
        else:
            n_ok += 1
            print(f"ok       {name} ({len(want)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
