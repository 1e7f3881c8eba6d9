#!/usr/bin/env python3
"""Key-shifted replication of a testdata SF directory — the 10x robustness
sweep's data builder (dev-only tool, same standing as localverify.py; the
engine never reads its output outside that sweep).

Each table is replicated `replicas` times with every id-like column shifted
by replica * (max(id)+1), so FK structure is preserved exactly (lineitem's
shifted l_orderkey matches orders' shifted o_orderkey, etc.) and dense key
spaces stay dense (p_partkey 0..N-1 becomes 0..replicas*N-1 — the
hierarchy query's div-10 ancestor chain stays closed). nation/region are
static dims and are copied untouched. DuckDB does the rewrite so parquet
physical types survive byte-for-byte (notably events.ts TIMESTAMP_NS,
which Spark cannot write back).

With --perturb-docs, every document WORD in replica r > 0 gets the suffix
'_r<r>': within a replica the near-dup structure is byte-for-byte the base
corpus's (both members of a pair transform identically), while ACROSS
replicas shingle sets become fully disjoint — so the true answer of an
exact similarity self-join is exactly `replicas` x the base pair set
instead of quadratic in the clone factor, per-shingle posting counts stay
base-sized, and the 100x decade of the exact joins becomes runnable with a
bounded output (the round-8 sweep the r7 verdict asked for).

With --perturb-embeddings, every embedding COMPONENT in replica r > 0 gets
a deterministic hash-seeded jitter (±0.01, a pseudo-random function of
(vec_id, dim, r)): within a replica the label/geometry structure stays the
base corpus's, but replicas are no longer exact clones — so kNN majority
votes and hard-negative extremes are VALUE-LEVEL nontrivial at the decade
instead of predicted-degenerate (every clone's 5NN being its own replicas).
Additionally ~1/13 of replica labels are FLIPPED (label+1 mod 10 where
hash(vec_id*1000+r) % 13 == 0, r > 0) — planted label noise, so the kNN
label-noise screen has a known signal to catch at scale: a flipped
replica's nearest neighbors are its unflipped siblings, whose majority
label disagrees with the flip, and the measured noise rate should sit
near the planted 7.7%.

Usage: python3 tools/scaleup.py <srcDir> <dstDir> [replicas=10] [--perturb-docs] [--perturb-embeddings]
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
perturb = "--perturb-docs" in sys.argv
perturb_emb = "--perturb-embeddings" in sys.argv
args = [a for a in sys.argv[3:] if not a.startswith("--")]
replicas = int(args[0]) if args else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def off(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]

o_orderkey = off("orders", "o_orderkey")
c_custkey = off("customer", "c_custkey")
p_partkey = off("part", "p_partkey")
s_suppkey = off("supplier", "s_suppkey")
event_id = off("events", "event_id")
user_id = off("events", "user_id")
doc_id = off("documents", "doc_id")
vec_id = off("embeddings", "vec_id")

SHIFTS = {
    "region": None,   # static dims: copy untouched
    "nation": None,
    "customer": {"c_custkey": c_custkey},
    "supplier": {"s_suppkey": s_suppkey},
    "part": {"p_partkey": p_partkey},
    "orders": {"o_orderkey": o_orderkey, "o_custkey": c_custkey},
    "lineitem": {"l_orderkey": o_orderkey, "l_partkey": p_partkey,
                 "l_suppkey": s_suppkey},
    "events": {"event_id": event_id, "user_id": user_id},
    "documents": {"doc_id": doc_id},
    "embeddings": {"vec_id": vec_id},
}

for table, shifts in SHIFTS.items():
    srcp = f"{src}/{table}.parquet"
    dstp = f"{dst}/{table}.parquet"
    if shifts is None:
        q = f"SELECT * FROM read_parquet('{srcp}')"
    else:
        repl = ", ".join(f"{c} + r * {o} AS {c}" for c, o in shifts.items())
        if table == "embeddings" and perturb_emb:
            # deterministic ±0.01 jitter per (vec_id, dim, replica>0):
            # replicas keep the base geometry but stop being exact clones
            repl += (", CASE WHEN r = 0 THEN embedding ELSE "
                     "list_transform(embedding, (x, i) -> CAST(x + "
                     "(CAST(hash(vec_id * 100000 + i * 1000 + r) % 2001 AS BIGINT)"
                     " - 1000) / 100000.0 AS FLOAT)) END AS embedding")
            # planted label noise: ~1/13 of replica labels flipped
            repl += (", CASE WHEN r > 0 AND hash(vec_id * 1000 + r) % 13 = 0 "
                     "THEN CAST((label + 1) % 10 AS INTEGER) "
                     "ELSE label END AS label")
        if table == "documents" and perturb:
            # suffix every word with _r<r> (r > 0): replica-disjoint shingle
            # spaces, byte-identical within-replica near-dup structure
            repl += (", CASE WHEN r = 0 THEN text ELSE array_to_string("
                     "list_transform(string_split(text, ' '),"
                     " w -> w || '_r' || r), ' ') END AS text")
        q = (f"SELECT * REPLACE ({repl}) "
             f"FROM read_parquet('{srcp}') CROSS JOIN range({replicas}) t(r)")
    con.execute(f"COPY ({q}) TO '{dstp}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dstp}')").fetchone()[0]
    print(f"{table}: {n} rows -> {dstp}")
