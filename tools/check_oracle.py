#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 DuckDB-oracle compare.

Usage: tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB against views over <sfDir>/*.parquet,
sorts columns by name and rows by all columns, and compares values.
Not shipped library code — uses the driver-side python stack.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(repr(v))
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat())
            else:
                norm.append(repr(v))
        out.append(tuple(norm))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = normalize(con.execute(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        want_rel = con.sql(oracle[name])
        want_cols = sorted(want_rel.columns)
        if got_cols != want_cols:
            print(f"[FAIL cols] {name}: spark={got_cols} oracle={want_cols}")
            failures += 1
            continue
        want = normalize(con.execute(
            f"SELECT {', '.join(want_cols)} FROM want_rel").fetchall())
        if got == want:
            print(f"[OK]  {name}: {len(got)} rows")
        else:
            failures += 1
            print(f"[FAIL rows] {name}: spark={len(got)} oracle={len(want)}")
            sg, sw = set(got), set(want)
            for r in list(sg - sw)[:3]:
                print(f"   spark-only:  {r}")
            for r in list(sw - sg)[:3]:
                print(f"   oracle-only: {r}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
