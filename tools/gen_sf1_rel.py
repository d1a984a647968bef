#!/usr/bin/env python3
"""Extend the sf1 extrapolation dir with RELATIONAL tables: 10
key-shifted disjoint replicas of the sf0.1 originals. Each replica
shifts every key column by r*(max_key+1), so per-key cardinalities,
join fan-outs, and value distributions are preserved EXACTLY — the
honest scale test for aggregate/join/loop machinery (not for
similarity semantics, which documents/embeddings cover with the
distribution-fitted generator in gen_sf1.py). Timestamps shift by r
days so event-time logic sees distinct-but-overlapping activity.

Usage: gen_sf1_rel.py [outdir=/tmp/sf1_graft]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_graft"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 100 -> sf10

con = duckdb.connect()

# key columns per table (region/nation stay as-is: bounded dims)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

maxes = {}
for t, keys in SHIFT.items():
    for k in keys:
        v, = con.execute(
            f"SELECT MAX({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')").fetchone()
        maxes[k] = v
# shared keys must shift by a consistent modulus on both sides
maxes["o_custkey"] = maxes["c_custkey"]
maxes["l_orderkey"] = maxes["o_orderkey"]
maxes["l_partkey"] = maxes["p_partkey"]
maxes["l_suppkey"] = maxes["s_suppkey"]

for t, keys in SHIFT.items():
    cols, = zip(*[(r[0],) for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()])
    exprs = []
    for c in cols:
        if c in keys:
            exprs.append(f"{c} + r * {maxes[c]} AS {c}")
        elif t == "events" and c == "ts":
            # shift by r days and keep the SOURCE parquet type —
            # timestamp[us] — so DuckDB oracles using epoch_ns(ts)/
            # epoch_us(ts) bind identically at every sf; the Spark side
            # is layout-agnostic (Tables.normalizeEventTs). Source ts
            # values are all microsecond-aligned, so this is exact.
            # (A plain INT64 column here broke every e-family oracle
            # at sf1: epoch_ns(BIGINT) doesn't exist.)
            exprs.append(
                "make_timestamp(epoch_us(ts) + r * 86400000000) AS ts")
        else:
            exprs.append(c)
    sel = ", ".join(exprs)
    dst = f"{OUT}/{t}.parquet"
    if os.path.islink(dst):
        os.unlink(dst)
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
        f"(SELECT unnest(range({R})) AS r) ORDER BY r) TO '{dst}' (FORMAT PARQUET)")
    n, = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()
    print(f"{t}: {n} rows")
