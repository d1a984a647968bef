#!/usr/bin/env python3
"""Generate a Zipf-skewed sf1-scale variant of events + lineitem for the
skew-stress evidence (VERDICT r12 task 4).

The uniform driver testdata proves the salted operators RESULT-EQUAL to
the plain plans but never proves them NECESSARY. This writes
/tmp/sf1_skew (default) with the key distributions salting exists for:

- events.parquet: same shape as sf1 (1M rows) but event_type is 90%
  'view' (one mega-hot group key); user_id/value/ts/event_id untouched
  so the distinct-user cardinality under the hot key stays ~full-domain
  (the exact-distinct state that serializes one reducer).
- lineitem.parquet: same 6M rows, l_suppkey redrawn Zipf-2-ish via
  floor(1/u) capped at the supplier domain — P(k) ~ k^-2, top key ~50%
  of all rows (3M rows on one join key).
- supplier.parquet: copied verbatim (the dim side is unchanged).

Deterministic: u derives from a hash of the row id, not random().

Usage: gen_skew.py [outDir] [srcDir]
"""
import os
import shutil
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_skew"
src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_graft"
os.makedirs(out, exist_ok=True)

con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT event_id, ts, user_id,
    CASE WHEN (hash(event_id) % 100 + 100) % 100 < 90 THEN 'view'
         ELSE ['click','purchase','signup','error'][
           CAST((hash(event_id * 31) % 4 + 4) % 4 AS INT) + 1] END AS event_type,
    value, props
  FROM read_parquet('{src}/events.parquet')
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

n_supp = con.execute(
    f"SELECT COUNT(*) FROM read_parquet('{src}/supplier.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * REPLACE (
    LEAST(CAST({n_supp} AS BIGINT), CAST(FLOOR(1.0 / (
      ((hash(l_orderkey * 7 + l_linenumber) % 1000000 + 1000000) % 1000000 + 0.5)
      / 1000000.0)) AS BIGINT)) AS l_suppkey)
  FROM read_parquet('{src}/lineitem.parquet')
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

shutil.copyfile(f"{src}/supplier.parquet", f"{out}/supplier.parquet")

for t in ["events", "lineitem"]:
    print(t, con.execute(f"""
      SELECT col, cnt, ROUND(100.0 * cnt / SUM(cnt) OVER (), 1) AS pct
      FROM (SELECT {'event_type' if t == 'events' else 'l_suppkey'} AS col,
            COUNT(*) AS cnt FROM read_parquet('{out}/{t}.parquet')
            GROUP BY 1 ORDER BY 2 DESC LIMIT 3) ORDER BY cnt DESC
    """).fetchall())
print("distinct users under hot type:", con.execute(f"""
  SELECT COUNT(DISTINCT user_id) FROM read_parquet('{out}/events.parquet')
  WHERE event_type = 'view'""").fetchone()[0])
