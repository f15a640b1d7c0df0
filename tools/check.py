#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables. Dev tooling only (the
engine itself never depends on this)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table = directory of part files
        p = f"{p}/*.parquet"
    if os.path.isdir(f"{sf_dir}/{t}.parquet") or os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = {"err": "no spark output"}
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracles:
        results[name] = {"rows_only": True, "spark_rows": len(spark_df),
                         "ok": len(spark_df) > 0}
        continue
    try:
        ora = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = {"err": f"oracle failed: {e}"}
        continue
    s = spark_df[sorted(spark_df.columns)]
    o = ora[sorted(ora.columns)] if sorted(spark_df.columns) == sorted(ora.columns) else None
    entry = {"rows_match": len(spark_df) == len(ora),
             "schema_match": sorted(spark_df.columns) == sorted(ora.columns),
             "spark_rows": len(spark_df), "oracle_rows": len(ora)}
    if o is None or not entry["rows_match"]:
        entry["hash_match"] = False
        if o is None:
            entry["schema_diff"] = [sorted(spark_df.columns), sorted(ora.columns)]
    else:
        def norm(col):
            if col.dtype.kind == 'M':
                col = pd.to_datetime(col)
                if getattr(col.dt, "tz", None) is not None:
                    col = col.dt.tz_localize(None)
                return col
            if len(col) and col.dtype == object:
                import datetime
                if isinstance(col.iloc[0], datetime.date):
                    return pd.to_datetime(col)
            return col
        mismatch = None
        for c in s.columns:
            a, b = norm(s[c].reset_index(drop=True)), norm(o[c].reset_index(drop=True))
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    af, bf = a.astype(float), b.astype(float)
                    bad = ~((af.isna() & bf.isna()) | (af == bf))
                else:
                    aa, bb = a.astype(object), b.astype(object)
                    bad = ~((aa.isna() & bb.isna()) | (aa == bb))
                if bad.any():
                    i = int(np.argmax(bad.values))
                    mismatch = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                    break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
        entry["hash_match"] = mismatch is None
        if mismatch:
            entry["first_diff"] = mismatch
    results[name] = entry

ok = sum(1 for v in results.values() if v.get("hash_match") or v.get("ok"))
print(json.dumps(results, indent=1, default=str))
print(f"== {ok}/{len(results)} green", file=sys.stderr)
