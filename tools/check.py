#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, runs the matching oracle SQL in
DuckDB (tables registered as views over the same sfDir parquet) and
compares values with columns sorted by name and rows sorted.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# fail fast on a runaway oracle (an in-memory DB has no spill dir, so
# exceeding the cap errors that one query) instead of eating host RAM
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '48GB')}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata stores each table as one file; Spark-written corpora
    # (ScaleUp's ~sf1 tier) store a directory of part files
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# GRAFT_CHECK_SKIP=a,b,c — oracles to skip (self-scaled sfx1 tier only:
# the naive pairwise/shingle-join SQL oracles are super-linear in corpus
# size, unlike the engine's banded/celled candidate generation, and the
# 10-clique duplicate corpus blows their intermediates past RAM).
skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
for name in sorted(skip & set(oracle)):
    print(f"SKIP {name}: oracle excluded via GRAFT_CHECK_SKIP")
    del oracle[name]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # Normalize integer WIDTH only (Spark int32 vs DuckDB int64 hashes
    # the same on the driver) — but leave float-vs-int alone: a DuckDB
    # HUGEINT (uncast integer sum) lands as float64 and MUST fail the
    # dtype check below, because it fails the driver's hash.
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df

fails = 0
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    files = glob.glob(f"{path}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    try:
        # check_dtype=True: the driver's hash is type-sensitive, so an
        # oracle column coming back as a different pandas dtype (e.g.
        # DuckDB HUGEINT from an uncast integer sum -> float64 vs
        # Spark's int64) must FAIL here too, not just mismatch values.
        pd.testing.assert_frame_equal(s, d, check_dtype=True, check_exact=True)
        print(f"OK   {name}: {len(s)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: value/dtype mismatch\n{str(e)[:800]}"); fails += 1
print(f"{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
