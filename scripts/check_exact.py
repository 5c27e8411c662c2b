#!/usr/bin/env python3
"""Exact (driver-style) replica of the correctness gate: stringified
cell-by-cell equality, no float tolerance — any diff the driver's hash
would catch, this prints.

Usage: python3 scripts/check_exact.py <sfDir> <verifyOutDir> [query ...]
"""
import json
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


def main(sf_dir, out_dir, names):
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name in sorted(names or oracle):
        if name not in oracle:
            print(f"NO-ORACLE {name}")
            continue
        spark_glob = str(Path(out_dir, name, "*.parquet"))
        if not list(Path(out_dir, name).glob("*.parquet")):
            print(f"MISSING  {name}")
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
                    if str(a) != str(b):
                        errs.append(f"{col}[{i}]: oracle={a!r} spark={b!r}")
                        if len(errs) > 8:
                            break
                if len(errs) > 8:
                    break
        if errs:
            n_bad += 1
            print(f"EXACT-DIFF {name}:")
            for e in errs[:9]:
                print(f"    {e}")
        else:
            n_ok += 1
            print(f"ok       {name}")
    print(f"\n{n_ok} exact, {n_bad} diff")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
