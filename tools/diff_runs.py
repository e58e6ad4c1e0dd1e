#!/usr/bin/env python3
"""Spark-vs-Spark exact diff of two graft.Verify output dirs.

The layout-differential gate runs Verify twice — once in the standard
configuration and once under an adversarial execution layout (different
parallelism, prime shuffle-partition count, AQE off, auto-broadcast off,
1 MiB input splits, whole-stage codegen off) — and this tool requires
every query's output to be IDENTICAL as a (column-name-sorted,
row-sorted) multiset, dtype-exact and value-exact, doubles bit-for-bit.

Unlike check.py this covers the rows-only queries too (everything
Verify dumps), so it extends exact content verification to outputs no
DuckDB oracle can recompute.
"""
import glob, os, sys

import numpy as np
import pandas as pd

dir_a = sys.argv[1]
dir_b = sys.argv[2]


def load(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _key(v):
    # make nested values hashable/sortable without losing exactness:
    # repr of a Python float is its shortest round-trip decimal (bijective
    # for finite doubles), bytes go to hex
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, np.ndarray):
        return repr(v.tolist())
    if isinstance(v, (list, tuple, dict)):
        return repr(v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_key, na_action="ignore")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


names_a = {os.path.basename(p) for p in glob.glob(f"{dir_a}/*") if os.path.isdir(p)}
names_b = {os.path.basename(p) for p in glob.glob(f"{dir_b}/*") if os.path.isdir(p)}
fails = 0
if names_a != names_b:
    print(f"FAIL query sets differ: only-a={sorted(names_a - names_b)} "
          f"only-b={sorted(names_b - names_a)}")
    fails += 1

for name in sorted(names_a & names_b):
    a, b = load(f"{dir_a}/{name}"), load(f"{dir_b}/{name}")
    if a is None or b is None:
        print(f"FAIL {name}: missing parquet ({'a' if a is None else 'b'})")
        fails += 1
        continue
    ca, cb = canon(a), canon(b)
    if list(ca.columns) != list(cb.columns):
        print(f"FAIL {name}: columns {list(ca.columns)} vs {list(cb.columns)}")
        fails += 1
        continue
    if len(ca) != len(cb):
        print(f"FAIL {name}: rows {len(ca)} vs {len(cb)}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(ca, cb, check_dtype=True, check_exact=True)
        print(f"OK   {name}: {len(ca)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: layout-sensitive output\n{str(e)[:800]}")
        fails += 1

total = len(names_a & names_b)
print(f"{total - fails}/{total} queries layout-invariant")
sys.exit(1 if fails else 0)
