#!/usr/bin/env python3
"""Strict local mirror of the DRIVER's correctness gate (round-1 lesson).

The older tools/check_oracle.py round-trips Spark parquet through DuckDB,
which normalizes representations (decimal -> duckdb decimal -> python
Decimal on both sides) and therefore hid the driver's hash mismatches.
The driver instead reads the Spark parquet with pandas/pyarrow and the
oracle via duckdb's .df(); a parquet DECIMAL surfaces as object
`decimal.Decimal('1.50')` while duckdb DECIMAL becomes float64 `1.5` —
different bytes, different hash, even when values are equal.

This checker reproduces that asymmetric path and compares dtype-sensitively:
  spark side : pandas.read_parquet(<outDir>/<name>)
  oracle side: duckdb.sql(oracle_sql).df()
  compare    : sorted column names, row count, then per-cell str() equality
               AND pandas hash_pandas_object equality after sorting columns
               by name and rows by all columns.
Array-typed columns are flagged as errors (the driver cannot sort them).

Usage: python3 tools/check_driver_hash.py <sfDir> <verifyOutDir> [query...]
(Driver-side tooling only — the Scala library has no DuckDB dependency.)
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_df(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            raise TypeError(f"column {c} is array-typed: driver cannot sort it")
        # Temporal normalization: round-1 driver evidence (q_stage_services,
        # q_asof_join, q_snapshot_scd2 all hash-green) shows the driver
        # tolerates parquet date-object vs duckdb datetime64[us] and ns-vs-us
        # units; only non-temporal representation gaps (decimals) fail it.
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and type(nn.iloc[0]).__name__ == "date":
                df[c] = pd.to_datetime(df[c])
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sf_dir: str, out_dir: str, only) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    oracle_sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only:
        unknown = only - set(oracle_sql)
        if unknown:  # a typo'd filter must not read as a green gate
            print(f"FAIL: unknown query name(s): {sorted(unknown)}")
            return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        spark_path = Path(out_dir) / name
        try:
            s = canon_df(pd.read_parquet(spark_path))
            o = canon_df(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns differ\n  spark:  {list(s.columns)}\n  oracle: {list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        sh = hash_pandas_object(s, index=False)
        oh = hash_pandas_object(o, index=False)
        if list(sh) != list(oh):
            # pin down the first differing cell for the report
            diffs = []
            for c in s.columns:
                sv, ov = s[c].map(cell), o[c].map(cell)
                bad = sv != ov
                if bad.any():
                    i = int(bad.idxmax())
                    diffs.append(f"{c}[{i}]: spark={sv[i]!r} ({s[c].dtype}) oracle={ov[i]!r} ({o[c].dtype})")
            if not diffs:  # values str-equal but dtype/bytes differ
                for c in s.columns:
                    if str(s[c].dtype) != str(o[c].dtype) or (
                        len(s) and type(s[c].iloc[0]) is not type(o[c].iloc[0])
                    ):
                        diffs.append(
                            f"{c}: dtype spark={s[c].dtype}/{type(s[c].iloc[0]).__name__ if len(s) else '-'}"
                            f" oracle={o[c].dtype}/{type(o[c].iloc[0]).__name__ if len(o) else '-'}")
            print(f"FAIL {name}: hash mismatch; " + ("; ".join(diffs[:4]) or "unknown"))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
