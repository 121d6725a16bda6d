#!/usr/bin/env python3
"""check_oracle.py with a PER-QUERY TIMEOUT — for large scale factors
where a handful of DuckDB oracle CTEs (quadratic NOT-IN subqueries
over 50k-doc gram sets) run for hours while everything else takes
seconds. Each query runs in its own subprocess; TIMEOUT entries are
reported (with the budget) instead of wedging the whole compare.

Usage: check_oracle_each.py <sf_dir> <verify_out_dir> [timeout_sec] [only_csv]
"""
import json, os, subprocess, sys

WORKER = r"""
import json, sys, duckdb
sf_dir, out_dir, name = sys.argv[1:4]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False)]
    return [(c, str(df[c].dtype)) for c in cols], sorted(rows)
spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
duck_df = con.sql(sql).df()
sc, sr = canon(spark_df); dc, dr = canon(duck_df)
if sc != dc:
    print(f"FAIL {name}: columns {sc} vs {dc}")
elif sr != dr:
    diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
    print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows, {len(diffs)} differing; first: {diffs[:2] if diffs else (sr[:1], dr[:1])}")
else:
    print(f"OK   {name} ({len(sr)} rows)")
"""


def main(sf_dir, out_dir, timeout, only):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(filter(None, os.environ.get("CHECK_SKIP", "").split(",")))
    n_ok = n_to = n_fail = 0
    for name in sorted(oracle):
        if name in skip or (only and name not in only):
            print(f"SKIP {name}")
            continue
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            out = (r.stdout or r.stderr).strip()
            print(out or f"ERR  {name}: empty worker output rc={r.returncode}")
            # classify on the verdict line, not the raw stdout: DuckDB
            # may emit a progress bar before it, which would miscount
            # a progress-prefixed OK as FAIL
            verdicts = [l for l in out.splitlines()
                        if l.startswith(("OK", "FAIL", "ERR"))]
            if verdicts and verdicts[-1].startswith("OK"):
                n_ok += 1
            else:
                n_fail += 1
        except subprocess.TimeoutExpired:
            n_to += 1
            print(f"TIMEOUT {name} (> {timeout}s)")
        sys.stdout.flush()
    print(f"{n_ok} OK, {n_fail} FAIL/ERR, {n_to} TIMEOUT (budget {timeout}s each)")


if __name__ == "__main__":
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 120, only)
