#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB with views named after the testdata
tables, sorts columns by name and rows by all columns, and hash-compares
values. Exit 0 iff every declared query matches.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if hasattr(v, "tolist"):  # numpy arrays / lists
        return str([cell(x) for x in v.tolist()])
    if isinstance(v, list):
        return str([cell(x) for x in v])
    return str(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        key = df.apply(lambda r: "|".join(cell(v) for v in r), axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def digest(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    declared = [d for d in sorted(os.listdir(out_dir))
                if os.path.isdir(os.path.join(out_dir, d))]
    fails = []
    for name in declared:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            fails.append((name, "no spark output"))
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracles:
            print(f"  {name}: rows={len(got)} (no oracle — rows-only check "
                  f"{'OK' if len(got) > 0 else 'FAIL'})")
            if len(got) == 0:
                fails.append((name, "0 rows, no oracle"))
            continue
        try:
            want = norm(con.execute(oracles[name]).df())
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}"))
            continue
        schema_ok = list(got.columns) == list(want.columns)
        rows_ok = len(got) == len(want)
        hash_ok = schema_ok and rows_ok and digest(got) == digest(want)
        status = "OK" if hash_ok else "MISMATCH"
        schema_note = "OK" if schema_ok else f"{list(got.columns)!r} != {list(want.columns)!r}"
        print(f"  {name}: rows={len(got)}/{len(want)} schema={schema_note} hash={status}")
        if not hash_ok:
            fails.append((name, "mismatch"))
            if schema_ok and rows_ok:
                diff = (got.astype(str) != want.astype(str))
                bad = diff.any(axis=1)
                print("    first diff rows (spark vs duckdb):")
                print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                                 want[bad].head(3).add_suffix("_duck")], axis=1)
                      .to_string())
    missing = [k for k in oracles if k not in declared]
    for k in missing:
        fails.append((k, "oracle declared but no query output"))
    print(f"{len(declared) - len([f for f in fails if f[0] in declared])}/{len(declared)} queries match")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
