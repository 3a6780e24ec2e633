#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads the parquet dumps
graft.Verify produced, runs each oracle SQL in DuckDB over the same
testdata tables, and compares (columns sorted by name, values hashed).
Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir> [nameFilter]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == object:
            out[c] = s.astype(str)
        elif "datetime" in str(s.dtype):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype.kind == "f":
            out[c] = s.round(9)
        elif s.dtype.kind in "iu":
            out[c] = s.astype("int64")
    return out.reset_index(drop=True)

def main(sf_dir: str, out_dir: str, only: str = None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # mirror graft.Verify's substring filter for single-query runs
        oracle = {k: v for k, v in oracle.items() if only in k}
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            continue
        eq = got.equals(exp)
        if not eq:
            dt_g, dt_e = dict(got.dtypes), dict(exp.dtypes)
            if dt_g != dt_e:
                print(f"FAIL {name}: dtypes spark={dt_g} oracle={dt_e}")
                continue
            diff = (got != exp) & ~(got.isna() & exp.isna())
            cells = diff.to_numpy().nonzero()
            if len(cells[0]) == 0:
                print(f"FAIL {name}: equals()=False but no differing cells "
                      f"(NaN/precision?) dtypes={dt_g}")
                continue
            i, j = cells[0][0], cells[1][0]
            c = got.columns[j]
            print(f"FAIL {name}: first diff row {i} col {c}: "
                  f"spark={got.iloc[i, j]!r} oracle={exp.iloc[i, j]!r}")
            continue
        n_ok += 1
        print(f"OK   {name} ({len(got)} rows)")
    print(f"== {n_ok}/{len(oracle)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
