#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Spark-written parquet in OUTDIR/<query>/ against the DuckDB oracle SQL in
OUTDIR/oracle_sql.json, run over the same sf testdata tables.

EXACT comparison, no rounding: the r1 gate rounded through float64 and
reported 51/51 while the driver failed 9 queries whose only difference was
DECIMAL serialization. To predict the driver, this now mirrors its data
paths — Spark output read via pandas/pyarrow (parquet DECIMAL stays a
Python decimal.Decimal object), oracle via duckdb fetchdf (DECIMAL becomes
float64) — and compares full-precision reprs WITH a type tag, so any
decimal-vs-float or trailing-zero representation gap fails here exactly as
it fails there. Engine rule enforced by this gate: query outputs must never
contain DECIMAL columns (keep DECIMAL inside aggregations only).

Usage: python3 tools/localverify.py <sfDir> <outDir>
Dev-only tool (driver-side python libs); not part of the Scala engine.
"""
import sys, json, glob, math, decimal, datetime
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    """Full-precision, type-tagged repr. float and int are the 'portable'
    families both engines agree on; anything else keeps its type name so a
    representation drift (Decimal, date-vs-datetime, ...) is a mismatch."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # full 17 significant digits, no rounding
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"  # scale-preserving — flags DECIMAL outputs
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # duckdb fetchdf surfaces DATE as midnight datetime64 while pyarrow
        # keeps date32 as datetime.date; the driver hashes these as equal
        # (every DATE-emitting query was hash-green in r1), so fold midnight
        # timestamps into the date representation
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return f"date:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"

def is_null(v):
    try:
        return v is None or (isinstance(v, (float, np.floating)) and math.isnan(v)) or pd.isna(v)
    except (TypeError, ValueError):
        return False

fails = 0
for name in sorted(oracles):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        # pandas/pyarrow path: parquet DECIMAL -> object(Decimal), like the driver
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        # duckdb fetchdf path: DECIMAL -> float64, like the driver's oracle side
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"FAIL {name}: columns {sc} vs {oc}"); fails += 1; continue
    if len(spark_df) != len(oracle_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(oracle_df)}"); fails += 1; continue
    srows = [tuple("NULL" if is_null(v) else norm(v) for v in r)
             for r in spark_df[sc].itertuples(index=False)]
    orows = [tuple("NULL" if is_null(v) else norm(v) for v in r)
             for r in oracle_df[oc].itertuples(index=False)]
    if srows != orows:
        bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
        print(f"FAIL {name}: first diff at row {bad} (cols {sc}):\n"
              f"  spark : {srows[bad]}\n  oracle: {orows[bad]}")
        fails += 1; continue
    print(f"ok   {name} ({len(spark_df)} rows)")
print(f"\n{len(oracles) - fails}/{len(oracles)} match")
sys.exit(1 if fails else 0)
