#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: compare each
Spark-written parquet in OUTDIR/<query>/ against the DuckDB oracle SQL in
OUTDIR/oracle_sql.json, run over the same sf testdata tables.
Usage: python3 tools/localverify.py <sfDir> <outDir>
Dev-only tool (driver-side python libs); not part of the Scala engine.
"""
import sys, json, glob, duckdb, math

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 6))
    return str(v)

fails = 0
for name in sorted(oracles):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"FAIL {name}: columns {sc} vs {oc}"); fails += 1; continue
    if len(spark_df) != len(oracle_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(oracle_df)}"); fails += 1; continue
    srows = [tuple(norm(v) for v in r) for r in spark_df[sc].itertuples(index=False)]
    orows = [tuple(norm(v) for v in r) for r in oracle_df[oc].itertuples(index=False)]
    if srows != orows:
        bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
        print(f"FAIL {name}: first diff at row {bad}:\n  spark : {srows[bad]}\n  oracle: {orows[bad]}")
        fails += 1; continue
    print(f"ok   {name} ({len(spark_df)} rows)")
print(f"\n{len(oracles) - fails}/{len(oracles)} match")
sys.exit(1 if fails else 0)
