#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's dumped
oracle SQL in DuckDB against the same sf dir and compare with the Spark
result parquet (column names sorted, values compared row-by-row)."""
import sys, json, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).fetchall()
        wcols = sorted([d[0] for d in con.sql(sql).description])
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = sorted([d[0] for d in got_rel.description])
        got = got_rel.fetchall()
        if wcols != gcols:
            fails.append((name, f"schema: oracle={wcols} spark={gcols}"))
            continue
        # reorder both to sorted-column order
        wo = [d[0] for d in con.sql(sql).description]
        go = [d[0] for d in got_rel.description]
        widx = [wo.index(c) for c in wcols]
        gidx = [go.index(c) for c in gcols]
        wrows = [tuple(r[i] for i in widx) for r in want]
        grows = [tuple(r[i] for i in gidx) for r in got]
        if len(wrows) != len(grows):
            fails.append((name, f"rowcount: oracle={len(wrows)} spark={len(grows)}"))
            continue
        bad = 0
        for i, (a, b) in enumerate(zip(wrows, grows)):
            ok = True
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not (math.isclose(x, y, rel_tol=0, abs_tol=0) or x == y):
                        ok = False
                elif x != y:
                    ok = False
            if not ok:
                bad += 1
                if bad <= 2:
                    fails.append((name, f"row {i}: oracle={a} spark={b}"))
        if bad > 2:
            fails.append((name, f"... {bad} mismatching rows total"))
        if bad == 0:
            print(f"OK   {name}  rows={len(wrows)}")
    except Exception as e:
        fails.append((name, f"ERROR {type(e).__name__}: {e}"))

rowsonly = set()
import os
for name in sorted(os.listdir(outdir)):
    if name != "oracle_sql.json" and name not in oracle:
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
        tag = "OK  " if n > 0 else "WARN"
        print(f"{tag} {name}  rows-only n={n}")

print()
if fails:
    print("FAILURES:")
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1)
print("all oracle checks passed")
