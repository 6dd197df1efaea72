#!/bin/bash
# The serialized close-of-round gate chain — ONE sbt at a time, in the
# order the driver replays it. Checked in (r13) so the sequence is part
# of the repo contract, not a /tmp artifact re-typed each round.
#
# The load-bearing ordering rule (r12 lesson): WarnProbe runs over the
# FULL SparkEntry.queries surface at BENCH conditions (sf0.1, 32
# threads) as the LAST gate before the close bench. A key landed after
# an earlier sweep therefore cannot ship unprobed — the r12 tail WARNs
# (rdd_76992_22/23) came from exactly that gap: three keys merged after
# a clean 1003-key sweep. Do NOT edit src/ while this runs: the t2/t32
# Verify dumps must come from the same code or detcompare false-fails.
#
# r14 hardening (r13 advice item): each step's exit status is
# accumulated and the script exits nonzero if ANY gate failed, so
# automation treating gate.sh as pass/fail actually fails on red; a
# broken `sbt test` aborts immediately (later gates are meaningless on
# a build that doesn't pass its own suite). Every bench JSON the chain
# produces is stashed under bench_runs/<tag>/ (r13 verdict item 5), so
# cross-run WARN/steady comparisons stay reproducible without prose
# archaeology.
#
# Usage: tools/gate.sh <tag>        e.g. tools/gate.sh r14
set -x
TAG=${1:?usage: tools/gate.sh <tag>}
cd "$(dirname "$0")/.."
FAIL=0
step() { # step <name> <exitcode>: log + accumulate
  echo "$1 exit: $2"
  FAIL=$((FAIL || $2))
}
echo "=== SBT TEST ==="
sbt -batch test > /tmp/${TAG}_sbttest.log 2>&1
rc=$?; step "sbt test" $rc
if [ $rc -ne 0 ]; then
  echo "sbt test FAILED — aborting gate chain (later gates are meaningless)"
  exit 1
fi
echo "=== VERIFY CPUS=32 ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_${TAG}_t32" > /tmp/${TAG}_verify32.log 2>&1
step "verify32" $?
echo "=== VERIFY CPUS=2 ==="
SPARK_GRAFT_CPUS=2 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_${TAG}_t2" > /tmp/${TAG}_verify2.log 2>&1
step "verify2" $?
echo "=== SELFCHECK ==="
python3 tools/selfcheck.py /tmp/verify_${TAG}_t32 /root/testdata/sf0.01 > /tmp/${TAG}_selfcheck.log 2>&1
step "selfcheck" $?
echo "=== DETCOMPARE (strict) ==="
python3 tools/detcompare.py /tmp/verify_${TAG}_t2 /tmp/verify_${TAG}_t32 > /tmp/${TAG}_detcompare.log 2>&1
step "detcompare" $?
echo "=== SMOKE ==="
sbt -batch 'runMain graft.tools.Smoke' > /tmp/${TAG}_smoke.log 2>&1
step "smoke" $?
echo "=== WARNPROBE (full surface, bench conditions) ==="
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.tools.WarnProbe /root/testdata/sf0.1' > /tmp/${TAG}_warnprobe.log 2>&1
step "warnprobe" $?
grep -c "WARN" /tmp/${TAG}_warnprobe.log
echo "=== BENCH ==="
mkdir -p bench_runs/${TAG}
N=$(ls bench_runs/${TAG}/ 2>/dev/null | grep -c '^run')
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Bench' > /tmp/${TAG}_bench.log 2>&1
step "bench" $?
# stash the run map under the round tag so a later close-protocol bench
# of the same tag lands as run2/run3... instead of overwriting run1
cp BENCH_LATEST.json bench_runs/${TAG}/run$((N + 1)).json
echo "ALL DONE (FAIL=$FAIL)"
exit $FAIL
