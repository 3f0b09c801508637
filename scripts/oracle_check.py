#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOut> [query ...]

Reads <verifyOut>/<name>/ (Verify.scala's parquet dump) and
<verifyOut>/oracle_sql.json, runs each oracle SQL in DuckDB against the
same parquet tables, and compares rows / schema (column names sorted) /
values. Mirrors the driver: columns sorted by name, rows sorted by all
columns, values hashed after a canonical string render.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def render(df: pd.DataFrame) -> list:
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(repr(round(v, 9)))
            elif hasattr(v, "isoformat"):  # date / datetime / Timestamp
                cells.append(pd.Timestamp(v).isoformat())
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_fail += 1
            continue
        scol, ocol = sorted(sdf.columns), sorted(odf.columns)
        if scol != ocol:
            print(f"[SCHEMA] {name}: spark={scol} oracle={ocol}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"[ROWS] {name}: spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        a, b = render(canon(sdf)), render(canon(odf))
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"[HASH] {name}: {len([1 for x,y in zip(a,b) if x!=y])} differing rows; first: {diffs}")
            n_fail += 1
        else:
            print(f"[ok  ] {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
