#!/usr/bin/env python3
"""Canary-normalized bench comparison (r10 verdict item 1).

Host contention confounded three rounds of driver-bench adjudication:
the same code measured 0.571-0.691 s/q depending on the host's load,
and every round needed prose triage ("the canary rose 32%, so...").
This tool makes that adjudication mechanical: every per-query steady
time is divided by the RUN'S CANARY MEDIAN (the fixed 1k-row
groupBy-count probe Bench times before every query), turning seconds
into canary-units that cancel host speed. Two runs of identical code
on differently-loaded hosts produce the same normalized numbers, so a
normalized regression is a CODE regression.

Usage:
  python3 tools/benchnorm.py OLD.json NEW.json [--top N]

Accepts either a BENCH_LATEST.json (full per-query maps) or a driver
BENCH_rNN.json (the JSON line is extracted from the captured tail;
per-query maps come from its queries_file if that file still holds the
same run, detected by matching totals). Historical BENCH_LATEST
versions live in git: `git show <round-commit>:BENCH_LATEST.json`.

Output: run summaries (raw and normalized s/q), the normalized-total
ratio, and the top-N per-query normalized regressions/improvements.
The quiet-floor anchor: r9's quietest run measured 0.571 s/q at canary
median 0.262 -> 2.18 canary-units/query; a healthy surface stays near
that anchor on ANY host.
"""
import json
import re
import sys


def load(path):
    d = json.load(open(path))
    if "tail" in d:  # driver BENCH_rNN.json: JSON line embedded in tail
        m = re.search(r'\{"metric".*\}', d["tail"])
        if not m:
            sys.exit(f"{path}: no bench JSON line in tail")
        d = json.loads(m.group(0))
    if "queries_steady" not in d:
        sys.exit(
            f"{path}: no per-query steady map — for a driver round file, "
            "use the BENCH_LATEST.json committed by that round "
            "(git show <commit>:BENCH_LATEST.json)")
    return d


def summary(d):
    steady = d["queries_steady"]
    cmed = d["canary_med"]
    n = len(steady)
    tot = sum(steady.values())
    return {
        "n": n,
        "steady_total": tot,
        "spq": tot / n,
        "canary_med": cmed,
        "canary_max": d.get("canary_max"),
        "norm_spq": tot / n / cmed,
        "norm": {k: v / cmed for k, v in steady.items()},
    }


def main():
    argv = sys.argv[1:]
    top = 12
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--top"):
            if "=" in a:
                top = int(a.split("=")[1])
            else:
                top = int(argv[i + 1]); i += 1
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = summary(load(args[0])), summary(load(args[1]))
    anchor = 0.571 / 0.262  # r9 quiet floor in canary-units/query
    print(f"| run | queries | steady (s) | s/q | canary med/max | norm u/q | vs quiet floor {anchor:.2f} |")
    print("|---|---|---|---|---|---|---|")
    for tag, s in (("old", old), ("new", new)):
        print(f"| {tag} | {s['n']} | {s['steady_total']:.1f} | {s['spq']:.3f} "
              f"| {s['canary_med']:.3f}/{s['canary_max']:.3f} "
              f"| {s['norm_spq']:.2f} | {s['norm_spq']/anchor:.2f}x |")
    ratio = new["norm_spq"] / old["norm_spq"]
    print(f"\nnormalized-total ratio new/old: {ratio:.3f} "
          f"({'REGRESSION' if ratio > 1.05 else 'improvement' if ratio < 0.95 else 'flat'} "
          "on like-for-like host units)")
    shared = sorted(set(old["norm"]) & set(new["norm"]),
                    key=lambda k: new["norm"][k] - old["norm"][k])
    print(f"\ntop {top} normalized regressions (canary-units, old -> new):")
    for k in reversed(shared[-top:]):
        o, nn = old["norm"][k], new["norm"][k]
        print(f"  {k:34s} {o:7.2f} -> {nn:7.2f}  (+{nn-o:.2f})")
    print(f"\ntop {top} normalized improvements:")
    for k in shared[:top]:
        o, nn = old["norm"][k], new["norm"][k]
        print(f"  {k:34s} {o:7.2f} -> {nn:7.2f}  ({nn-o:.2f})")
    only_new = sorted(set(new["norm"]) - set(old["norm"]))
    if only_new:
        print(f"\nnew keys ({len(only_new)}): " + ", ".join(
            f"{k}={new['norm'][k]:.2f}u" for k in only_new))


if __name__ == "__main__":
    main()
