#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (row count, schema, values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

(Driver-side tooling only — the Scala library has no DuckDB dependency.)
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    oracle_sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            orows = oracle.fetchall()
            spark = con.sql(f"select * from read_parquet('{spark_path}/*.parquet')")
            scols = [c.lower() for c in spark.columns]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ\n  oracle: {sorted(ocols)}\n  spark:  {sorted(scols)}")
            n_fail += 1
            continue
        # align column order by name
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        o = normalize([tuple(r[i] for i in operm) for r in orows])
        s = normalize([tuple(r[i] for i in sperm) for r in srows])
        if len(o) != len(s):
            print(f"FAIL {name}: row count oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        if o != s:
            bad = [(a, b) for a, b in zip(o, s) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for a, b in bad:
                print(f"  oracle: {a}\n  spark:  {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(o)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
