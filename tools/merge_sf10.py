#!/usr/bin/env python3
"""Build the SF10 spot-decade ledger (VERDICT r12 task 3): merge sf10
curve rows with each query's sf1 minimum and report the decade growth
factor and the implied scaling exponent alpha = log10(t_sf10 / t_sf1)
(alpha 1.0 = linear in data size, < 1 sub-linear, > 1 super-linear).
Job-floor caveat: at small absolute times the ~0.5 s Spark session
floor dominates both numerators, biasing alpha DOWN; the exponent is
only meaningful when t_sf1 is well above the floor.

Usage: merge_sf10.py <curve_rows.jsonl-or-curve_new.json> <out.json>
       [--sf1 SF1_SWEEP_r12.json]

curve rows: the [curve] JSON lines from ProfileMain (sf label
'sf10_graft'), one per line or as a JSON array.
"""
import json
import math
import sys


def load_rows(path):
    txt = open(path).read().strip()
    if txt.startswith("["):
        return json.loads(txt)
    return [json.loads(l) for l in txt.splitlines() if l.strip()]


def main(argv):
    rows_path, out_path = argv[1], argv[2]
    sf1_path = argv[argv.index("--sf1") + 1] if "--sf1" in argv \
        else "SF1_SWEEP_r12.json"
    rows = [r for r in load_rows(rows_path) if r["sf"].startswith("sf10")]
    sweep = json.load(open(sf1_path))
    sf1_min = {q: v.get("spark_min", v.get("spark"))
               for q, v in sweep.get("queries", {}).items()}
    out = {"metric": "sf10_spot_decade", "round": 13, "queries": {}}
    for r in rows:
        q = r["q"]
        t1 = sf1_min.get(q)
        ent = {"sf10_min_s": r["min"], "sf10_runs": r["runs"],
               "sf1_min_s": t1}
        if t1:
            ent["growth_x"] = round(r["min"] / t1, 2)
            ent["alpha"] = round(math.log10(r["min"] / t1), 3)
        out["queries"][q] = ent
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    for q, e in sorted(out["queries"].items()):
        print(f"{q}: sf10={e['sf10_min_s']}s sf1={e.get('sf1_min_s')}s "
              f"growth={e.get('growth_x')}x alpha={e.get('alpha')}")


if __name__ == "__main__":
    main(sys.argv)
