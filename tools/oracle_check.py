#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's dumped
oracle SQL in DuckDB against the same sf dir and compare with the Spark
result parquet.

Models the driver's PANDAS-based compare (r1 lesson): both sides go
through DataFrames, columns sorted by name, and values are compared
dtype-sensitively — DuckDB HUGEINT becomes float64 in pandas and
hash-mismatches Spark's int64 even when the numbers are equal, so a
dtype-kind difference (int vs float) on a column is reported as FAIL.
Array-typed cells are reported too (the driver's lexsort cannot hash
numpy arrays)."""
import sys, json, math, os, glob
import decimal
import numpy as np
import pandas as pd
import duckdb

def read_spark_parquet(d):
    """Load a Spark result dir the way the DRIVER does — pandas/pyarrow,
    NOT DuckDB. DuckDB coerces parquet DECIMAL to float64, which masked
    the q_ks_drift r15 escape; pyarrow keeps decimal128 as
    object(Decimal), exactly what the driver hashes."""
    parts = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []

def dtype_kind(s):
    return s.dtype.kind  # 'i' int, 'u' uint, 'f' float, 'O' object, 'b' bool

for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
        got = read_spark_parquet(f"{outdir}/{name}")
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            fails.append((name, f"schema: oracle={wcols} spark={gcols}"))
            continue
        want, got = want[wcols], got[gcols]
        if len(want) != len(got):
            fails.append((name, f"rowcount: oracle={len(want)} spark={len(got)}"))
            continue
        bad = 0
        def first_nonnull(s):
            for v in s.values:
                if v is None:
                    continue
                if isinstance(v, float) and math.isnan(v):
                    continue
                return v
            return None

        for c in wcols:
            wk, gk = dtype_kind(want[c]), dtype_kind(got[c])
            # the driver hashes formatted values: int64 5 vs float64 5.0 differ
            if {wk, gk} == {"i", "f"} or {wk, gk} == {"u", "f"}:
                fails.append((name, f"dtype: col {c} oracle={want[c].dtype} spark={got[c].dtype} (pandas formats differ -> driver hash mismatch)"))
                bad += 1
                continue
            # object-vs-numeric split (the q_ks_drift r15 escape): Spark
            # parquet decimal decodes to Python Decimal ('224780220') while
            # DuckDB DECIMAL->float64 formats '224780220.0' — equal numbers,
            # different formatted hash. Flag any O/{i,u,f} split whose object
            # side holds Decimal (or other numeric objects).
            if wk != gk and "O" in (wk, gk):
                ov = first_nonnull(want[c] if wk == "O" else got[c])
                if isinstance(ov, (decimal.Decimal, int, float)):
                    fails.append((name, f"dtype: col {c} oracle={want[c].dtype} spark={got[c].dtype} object({type(ov).__name__})-vs-numeric (pandas formats differ -> driver hash mismatch)"))
                    bad += 1
                    continue
            # Decimal on BOTH sides still risks formatting drift ('5' vs
            # '5.0' by declared scale) — the house rule is no decimal
            # column survives to the result boundary at all.
            if wk == "O" and gk == "O":
                wv, gv = first_nonnull(want[c]), first_nonnull(got[c])
                if isinstance(wv, decimal.Decimal) or isinstance(gv, decimal.Decimal):
                    fails.append((name, f"dtype: col {c} is Decimal-typed at the boundary (house rule: cast to long/double in BOTH the query and the oracle)"))
                    bad += 1
                    continue
            for i, (x, y) in enumerate(zip(want[c].values, got[c].values)):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    fails.append((name, f"array-typed cell in col {c} (driver lexsort crashes)"))
                    bad += 1
                    break
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    ok = xn and yn
                elif isinstance(x, float) or isinstance(y, float):
                    ok = float(x) == float(y)
                else:
                    ok = x == y
                if not ok:
                    bad += 1
                    if bad <= 2:
                        fails.append((name, f"col {c} row {i}: oracle={x!r} spark={y!r}"))
        if bad > 2:
            fails.append((name, f"... {bad} mismatches total"))
        if bad == 0:
            print(f"OK   {name}  rows={len(want)}")
    except Exception as e:
        fails.append((name, f"ERROR {type(e).__name__}: {e}"))

for name in sorted(os.listdir(outdir)):
    if name != "oracle_sql.json" and name not in oracle:
        # rows-only queries must still survive the driver's pandas pipeline:
        # load through .df() and probe for array cells
        df = read_spark_parquet(f"{outdir}/{name}")
        arr_cols = [c for c in df.columns
                    if len(df) and isinstance(df[c].iloc[0], np.ndarray)]
        dec_cols = [c for c in df.columns
                    if len(df) and isinstance(df[c].iloc[0], decimal.Decimal)]
        if arr_cols:
            fails.append((name, f"rows-only query has array cols {arr_cols} (driver lexsort crashes)"))
        elif dec_cols:
            fails.append((name, f"rows-only query has Decimal cols {dec_cols} (house rule: cast to long/double at the boundary)"))
        else:
            tag = "OK  " if len(df) > 0 else "WARN"
            print(f"{tag} {name}  rows-only n={len(df)}")

print()
if fails:
    print("FAILURES:")
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1)
print("all oracle checks passed")
