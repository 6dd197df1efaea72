#!/usr/bin/env python3
"""Determinism probe comparator: byte-level comparison of two Verify
output dirs (e.g. SPARK_GRAFT_CPUS=2 vs =32). Parquet files are not
byte-identical across partition counts (metadata), so compare VALUES:
load each query's parquet from both dirs with pyarrow and require
identical schema + identical row sequence (order matters — every query
output is deterministically ordered by contract, so an order-only
difference is a determinism REGRESSION and fails by default).

Usage: detcompare.py [--allow-reorder] <dirA> <dirB>

--allow-reorder downgrades order-only differences (same multiset of
rows, different order) to a warning that still exits 0 — useful only
when probing a deliberately unordered intermediate, never for Verify
outputs. File listings are unioned from BOTH dirs, so an output that
exists only in dirB is reported missing too.
"""
import sys
import os
import pyarrow.parquet as pq


def listing(d):
    return set(
        n for n in os.listdir(d)
        if not n.endswith(".json") and not n.startswith(("_", ".")))


def main():
    args = [a for a in sys.argv[1:] if a != "--allow-reorder"]
    allow_reorder = "--allow-reorder" in sys.argv[1:]
    a_dir, b_dir = args[0], args[1]
    names = sorted(listing(a_dir) | listing(b_dir))
    ok = bad = missing = reordered = 0
    for n in names:
        pa, pb = os.path.join(a_dir, n), os.path.join(b_dir, n)
        if not os.path.exists(pa) or not os.path.exists(pb):
            only = a_dir if os.path.exists(pa) else b_dir
            print(f"MISSING  {n} (only in {only})")
            missing += 1
            continue
        ta = pq.read_table(pa)
        tb = pq.read_table(pb)
        if ta.schema != tb.schema:
            print(f"SCHEMA   {n}: {ta.schema} != {tb.schema}")
            bad += 1
            continue
        # value compare: order-sensitive (outputs are ordered by
        # contract). If only the order differs, diagnose it as REORDER —
        # a determinism failure in its own right (counts toward `bad`
        # unless --allow-reorder), distinct from a value DIFF.
        same = ta.num_rows == tb.num_rows and ta.equals(tb)
        if not same and ta.num_rows == tb.num_rows:
            try:
                keys = [(f.name, "ascending") for f in ta.schema
                        if not str(f.type).startswith(("list", "struct", "map"))]
                if ta.sort_by(keys).equals(tb.sort_by(keys)):
                    print(f"REORDER  {n} (values identical, row order differs)")
                    reordered += 1
                    if allow_reorder:
                        ok += 1
                    else:
                        bad += 1
                    continue
            except Exception:
                pass
        if not same:
            print(f"DIFF     {n} ({ta.num_rows} vs {tb.num_rows} rows)")
            bad += 1
            continue
        ok += 1
    print(f"\n{ok} identical, {bad} different "
          f"({reordered} order-only), {missing} missing")
    sys.exit(1 if (bad or missing) else 0)


if __name__ == "__main__":
    main()
