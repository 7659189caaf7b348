#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over the same
parquet tables, sorts columns by name, and compares values exactly.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # exact value compare, column by column
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = pd.Series([str(x) == str(y) for x, y in zip(a, b)])
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                bad.append((c, i, a.iloc[i], b.iloc[i],
                            str(a.dtype), str(b.dtype)))
        if bad:
            c, i, av, bv, at, bt = bad[0]
            print(f"FAIL {name}: col {c} row {i}: spark={av!r}({at}) "
                  f"oracle={bv!r}({bt})  [{len(bad)} bad cols]")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # rows-only queries (no oracle)
    for path in sorted(glob.glob(f"{out_dir}/*/")):
        name = path.rstrip("/").split("/")[-1]
        if name in oracles:
            continue
        files = glob.glob(f"{path}*.parquet")
        if not files:
            print(f"FAIL {name}: rows-only query produced no output")
            n_fail += 1
            continue
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        print(f"OK   {name} (rows-only, {n} rows)" if n > 0
              else f"FAIL {name}: rows-only, 0 rows")
        n_fail += 0 if n > 0 else 1
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
