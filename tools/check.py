#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows, compare values (exact for non-floats,
tiny-epsilon report for floats so rounding bugs are visible)."""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = None
    for c in got.columns:
        gv, ev = gs[c], es[c]
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            if a is None or (isinstance(a, float) and math.isnan(a)):
                if b is None or (isinstance(b, float) and math.isnan(b)): continue
                bad = (c, i, a, b); break
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    bad = (c, i, a, b); break
            elif str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
