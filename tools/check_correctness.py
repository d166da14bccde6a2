#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out

Expects `graft.Verify` to have populated <out>/<query>/ parquet dirs and
<out>/oracle_sql.json. Registers each testdata parquet as a DuckDB view,
runs each oracle, and compares against the Spark result: columns sorted by
name, rows sorted by all columns, exact value equality (tolerance only
reported, not forgiven).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.sql(oracle[name]).df())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols spark={list(got.columns)} duckdb={list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows spark={len(got)} duckdb={len(want)}")
        else:
            import numpy as np
            dtype_fail = []
            for c in got.columns:
                ga, wa = got[c].dtype, want[c].dtype
                if ga != wa:
                    # absorb only same-kind WIDENING (cast both to the wider
                    # dtype) - narrowing the oracle to a buggy narrow Spark
                    # result would mask truncation bugs
                    if ga.kind == wa.kind and ga.kind in "iuf":
                        wider = ga if ga.itemsize >= wa.itemsize else wa
                        got[c] = got[c].astype(wider)
                        want[c] = want[c].astype(wider)
                        print(f"note {name}.{c}: widened {ga}/{wa} -> {wider}")
                    else:
                        dtype_fail.append(f"{c}: spark={ga} duckdb={wa}")
            if dtype_fail:
                status.append("dtypes " + "; ".join(dtype_fail))
            neq_cols = []
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
                    if not eq.all():
                        i = int((~eq).argmax())
                        neq_cols.append(f"{c}[row {i}]: spark={a.iloc[i]!r} duckdb={b.iloc[i]!r}")
                except Exception as e:
                    neq_cols.append(f"{c}: compare error {e}")
            if neq_cols:
                status.append("values " + "; ".join(neq_cols[:3]))
        if status:
            print(f"FAIL {name}: " + " | ".join(status))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # queries without oracle: report row counts only
    no_oracle = set()
    for d in glob.glob(f"{out_dir}/*/"):
        qname = d.rstrip("/").rsplit("/", 1)[-1]
        if qname not in oracle:
            no_oracle.add(qname)
    for name in sorted(no_oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        print(f"INFO {name}: no oracle, {n} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
