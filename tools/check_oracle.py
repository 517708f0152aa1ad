#!/usr/bin/env python3
"""Self-check mirroring the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify output
parquet (sort columns by name, sort rows, compare values)."""
import json, math, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return round(v, 6)
    if isinstance(v, bool): return bool(v)
    if isinstance(v, (int,)): return int(v)
    return str(v)

for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = qdir.rstrip("/").split("/")[-1]
    if name.endswith(".parquet"):
        name = name[: -len(".parquet")]
    try:
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}"))
        continue
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        want = con.execute(oracle[name]).fetchall()
        want_cols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    # sort columns by name, then rows
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
    if sorted(got_cols) != sorted(want_cols):
        fails.append((name, f"columns differ: {sorted(got_cols)} vs {sorted(want_cols)}"))
        continue
    g = sorted([tuple(norm(r[i]) for i in gi) for r in got], key=lambda t: tuple(map(str,t)))
    w = sorted([tuple(norm(r[i]) for i in wi) for r in want], key=lambda t: tuple(map(str,t)))
    if g == w:
        passes.append((name, len(g)))
    else:
        diff = next(((i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b),
                    ("len", len(g), len(w)))
        fails.append((name, f"value mismatch at {diff}"))

print(f"PASS={len(passes)} ROWS_ONLY={len(rows_only)} FAIL={len(fails)}")
for n, c in passes: print(f"  pass {n} ({c} rows)")
for n, c in rows_only: print(f"  rows-only {n} ({c} rows)" + ("  ** EMPTY **" if c == 0 else ""))
for n, m in fails: print(f"  FAIL {n}: {m}")
sys.exit(1 if fails else 0)
