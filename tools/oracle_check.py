#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs SparkEntry.oracleSql,
mimicking the round driver's t2 check: run graft.Verify first (dumps
<out>/<name>/ parquet + <out>/oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same sf tables and compares
(columns sorted by name, rows sorted, values hashed).

Usage: tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value rendering: floats rounded, all to str
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(qdir)
            duck_df = con.execute(oracle[name]).fetchdf()
            a, b = norm(spark_df), norm(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} != {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b).any(axis=1)
                i = neq.idxmax()
                print(f"FAIL {name}: value mismatch at sorted-row {i}:")
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
