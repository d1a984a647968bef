#!/usr/bin/env python3
"""Time every oracle SQL query in DuckDB and write a per-query JSON
artifact (DUCKDB_r{N}.json) so the Spark-vs-DuckDB ratio in BENCHNOTES
is mechanically reproducible from committed files instead of prose.

Methodology mirrors the head-to-head protocol used for the official
bench records: same machine, same parquet inputs registered as views,
DuckDB at the thread count given by --threads (default 32 to match
Spark's local[32]), one untimed warmup pass then --runs timed passes
per query, reporting the MIN (DuckDB has no JVM/codegen warmup; min is
the fairest single figure against host-stall noise — see BENCHNOTES
host-stall ledger).

Usage:
  bench_duckdb.py <sfDir> <oracle_sql.json> <out.json> [--runs 2] [--threads 32]

oracle_sql.json is the dump graft.Verify writes next to its result
parquets (it IS SparkEntry.oracleSql, so the timed SQL is identical to
what the correctness gate runs).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(argv):
    sf_dir, oracle_path, out_path = argv[1], argv[2], argv[3]
    runs = int(argv[argv.index("--runs") + 1]) if "--runs" in argv else 2
    threads = int(argv[argv.index("--threads") + 1]) if "--threads" in argv else 32

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(oracle_path) as f:
        oracles = json.load(f)

    queries, errors = {}, []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warmup (parse + any caching)
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            queries[name] = {"min": round(min(times), 4),
                             "runs": [round(x, 4) for x in times]}
            print(f"{name}: {queries[name]['min']:.4f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors.append(name)
            print(f"{name}: ERROR {e}", file=sys.stderr)
        # Long sweeps (sf1: single queries run minutes) must survive a
        # killed process: keep a partial dump current after every query.
        with open(out_path + ".partial", "w") as f:
            json.dump({k: v["min"] for k, v in queries.items()}, f)

    total = round(sum(q["min"] for q in queries.values()), 4)
    record = {
        "metric": "duckdb_total_min", "value": total, "unit": "sec",
        "threads": threads, "runs_per_query": runs, "sf": sf_dir,
        "queries": {k: v["min"] for k, v in queries.items()},
        "all_runs": {k: v["runs"] for k, v in queries.items()},
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": record["metric"], "value": total,
                      "unit": "sec", "n": len(queries), "errors": errors}))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
