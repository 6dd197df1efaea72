#!/usr/bin/env python3
"""Determinism probe comparator: byte-level comparison of two Verify
output dirs (e.g. SPARK_GRAFT_CPUS=2 vs =32). Parquet files are not
byte-identical across partition counts (metadata), so compare VALUES:
load each query's parquet from both dirs with pyarrow and require
identical schema + identical row sequence (order matters — every query
output is deterministically ordered by contract).

Usage: detcompare.py <dirA> <dirB>
"""
import sys
import os
import pyarrow.parquet as pq


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        n for n in os.listdir(a_dir)
        if not n.endswith(".json") and not n.startswith(("_", ".")))
    ok = bad = missing = 0
    for n in names:
        pa, pb = os.path.join(a_dir, n), os.path.join(b_dir, n)
        if not os.path.exists(pb):
            print(f"MISSING  {n} (only in {a_dir})")
            missing += 1
            continue
        ta = pq.read_table(pa)
        tb = pq.read_table(pb)
        if ta.schema != tb.schema:
            print(f"SCHEMA   {n}: {ta.schema} != {tb.schema}")
            bad += 1
            continue
        # value compare: order-sensitive first (outputs are ordered by
        # contract); if that differs, retry sorted by every sortable
        # column so a pure part-file interleaving doesn't false-alarm
        same = ta.num_rows == tb.num_rows and ta.equals(tb)
        if not same and ta.num_rows == tb.num_rows:
            try:
                keys = [(f.name, "ascending") for f in ta.schema
                        if not str(f.type).startswith(("list", "struct", "map"))]
                same = ta.sort_by(keys).equals(tb.sort_by(keys))
                if same:
                    print(f"REORDER  {n} (values identical, row order differs)")
            except Exception:
                pass
        if not same:
            print(f"DIFF     {n} ({ta.num_rows} vs {tb.num_rows} rows)")
            bad += 1
            continue
        ok += 1
    print(f"\n{ok} identical, {bad} different, {missing} missing")
    sys.exit(1 if (bad or missing) else 0)


if __name__ == "__main__":
    main()
