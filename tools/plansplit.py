#!/usr/bin/env python3
"""Split an ExplainAudit full-plan dump into per-query plan files.

ExplainAudit with explicit query names prints, per query, a one-line
summary (name, operator counts) followed by the formatted plan. This
splits that stream into plans/<tag>/<name>_<suffix>.txt for the judge.
Usage: tools/plansplit.py <dumpfile> <outdir> <suffix>
"""
import os, re, sys

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)

# summary lines look like: "<name>  exch=2 bhj=1 ..." — use them as splits
pat = re.compile(r"^(\S+)\s+exch=\d+")
cur, buf = None, []

def flush():
    if cur is not None:
        with open(f"{outdir}/{cur}_{suffix}.txt", "w") as f:
            f.write("".join(buf))

for line in open(dump, errors="replace"):
    # strip sbt's "[info] " prefix; drop other sbt/log noise lines
    if line.startswith("[info] "):
        line = line[7:]
    elif line.startswith("["):
        continue
    m = pat.match(line)
    if m:
        flush()
        cur, buf = m.group(1), [line]
    elif cur is not None:
        buf.append(line)
flush()
print("wrote", len([f for f in os.listdir(outdir) if f.endswith(f"_{suffix}.txt")]), "plans")
