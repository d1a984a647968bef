#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB (tables = parquet files of the given
sf dir) and compare against the Spark result parquet that Verify wrote.

Comparison mirrors the described driver semantics: sort columns by
name, sort rows, compare values exactly.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
        except (TypeError, ValueError):
            return False
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b
    return str(a) == str(b)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cells_equal(x, y):
                return False, f"col {col} row {i}: {x!r} != {y!r}"
    return True, "ok"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    # GRAFT_VERIFY_ONLY runs dump a subset of queries; a name with no
    # result directory was filtered out, not broken — skip it quietly so
    # scoped runs report only what actually ran. In an UNSCOPED run a
    # missing directory means the query crashed during the dump (Verify
    # catches per-query Throwables and writes nothing), so it must FAIL.
    scoped = bool(os.environ.get("GRAFT_VERIFY_ONLY"))
    for name in sorted(oracles):
        sql = oracles[name]
        if not os.path.isdir(f"{out_dir}/{name}"):
            if scoped:
                n_skip += 1
                continue
            print(f"FAIL {name}: no spark result dumped (query crashed?)")
            n_fail += 1
            continue
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        ok, msg = frames_equal(canon(got), canon(expected))
        # Representational-divergence audit: a column that is exact int
        # on the Spark side but float on the oracle side (DuckDB HUGEINT
        # -> pandas float64, e.g. an uncast SUM()//) compares equal here
        # but is hasher-dependent in other checkers — the p27 r10 flap's
        # only cross-engine divergence was exactly this. Surface it so
        # the oracle gets a CAST instead of relying on float tolerance.
        for colname in set(got.columns) & set(expected.columns):
            gk, ek = got[colname].dtype.kind, expected[colname].dtype.kind
            if {gk, ek} == {"i", "f"}:
                print(f"WARN {name}: dtype divergence on '{colname}' "
                      f"(spark {got[colname].dtype} vs oracle "
                      f"{expected[colname].dtype}) — CAST the oracle column")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            # Persist BOTH engines' canonical dumps so a flap that never
            # reproduces on re-run is still diagnosable post-hoc (judge
            # round-10 task: artifact, not just verdict).
            mdir = os.path.join(out_dir, "_mismatch")
            os.makedirs(mdir, exist_ok=True)
            canon(got).to_csv(f"{mdir}/{name}_spark.csv", index=False)
            canon(expected).to_csv(f"{mdir}/{name}_oracle.csv", index=False)
            with open(f"{mdir}/{name}_diff.txt", "w") as fh:
                fh.write(msg + "\n")
            print(f"     mismatch artifacts -> {mdir}/{name}_*.csv")
            n_fail += 1
    skip_note = f" / {n_skip} not-dumped" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip_note} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
