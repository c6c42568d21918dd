#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff.

Usage: python3 scripts/check.py [sfdir] [outdir] [--run]
  --run  first runs `sbt runMain graft.Verify <sfdir> <outdir>`
"""
import sys, os, json, glob, subprocess
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare (mirrors a hash of sorted values)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    if "--run" in sys.argv:
        r = subprocess.run(["sbt", f'runMain graft.Verify {SF} {OUT}'],
                           cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            status = "rows-only"
            ok = len(got) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} ({status}, {len(got)} rows)")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if not g.equals(w):
            diff = (g != w)
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            print(pd.concat([g[bad].head(3).add_prefix("got_"),
                             w[bad].head(3).add_prefix("want_")], axis=1).to_string())
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
