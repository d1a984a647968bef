#!/usr/bin/env python3
"""Merge fresh sf-curve rows into the curve_out.json ledger.

Usage: python3 tools/merge_curve.py [curve_new.json]

Keyed by (q, sf): a fresh row REPLACES the ledger row for the same
query+scale-factor; all other ledger rows are kept. The merged ledger
is rewritten sorted by (q, sf) and validated:
  - no duplicate (q, sf) keys;
  - no two DIFFERENT sfs of one query with byte-identical runs (the
    r11 d24 corruption mode — a copy/paste'd row masquerading as a
    second scale factor).
Exit non-zero on validation failure; round_close.sh runs the same
validation over the final ledger.
"""
import json
import sys


def validate(rows):
    errs = []
    seen = {}
    for r in rows:
        k = (r["q"], r["sf"])
        if k in seen:
            errs.append(f"duplicate (q, sf) entry: {k}")
        seen[k] = r
    byq = {}
    for r in rows:
        byq.setdefault(r["q"], []).append(r)
    for q, rs in byq.items():
        sigs = {}
        for r in rs:
            sig = json.dumps(r["runs"])
            if sig in sigs:
                errs.append(
                    f"{q}: sfs {sigs[sig]} and {r['sf']} have byte-identical "
                    f"runs {sig} - one is a stale copy")
            sigs[sig] = r["sf"]
    return errs


SF_ORDER = {"sf0.001": 0, "sf0.01": 1, "sf0.1": 2, "sf1": 3}


def main():
    new_path = sys.argv[1] if len(sys.argv) > 1 else "curve_new.json"
    with open(new_path) as f:
        fresh = json.load(f)
    for r in fresh:  # the sf1 decade lives in /tmp/sf1_graft
        if r["sf"] == "sf1_graft":
            r["sf"] = "sf1"
    try:
        with open("curve_out.json") as f:
            ledger = json.load(f)
    except FileNotFoundError:
        ledger = []
    fresh_keys = {(r["q"], r["sf"]) for r in fresh}
    merged = [r for r in ledger if (r["q"], r["sf"]) not in fresh_keys] + fresh
    merged.sort(key=lambda r: (r["q"], SF_ORDER.get(r["sf"], 9), r["sf"]))
    errs = validate(merged)
    if errs:
        for e in errs:
            print(f"MERGE-FAIL {e}", file=sys.stderr)
        sys.exit(1)
    with open("curve_out.json", "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"merged {len(fresh)} fresh rows -> curve_out.json "
          f"({len(merged)} total, validated)")


if __name__ == "__main__":
    main()
