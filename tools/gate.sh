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
# Usage: tools/gate.sh <tag>        e.g. tools/gate.sh r13
set -x
TAG=${1:?usage: tools/gate.sh <tag>}
cd "$(dirname "$0")/.."
echo "=== SBT TEST ==="
sbt -batch test > /tmp/${TAG}_sbttest.log 2>&1
echo "sbt test exit: $?"
echo "=== VERIFY CPUS=32 ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_${TAG}_t32" > /tmp/${TAG}_verify32.log 2>&1
echo "verify32 exit: $?"
echo "=== VERIFY CPUS=2 ==="
SPARK_GRAFT_CPUS=2 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_${TAG}_t2" > /tmp/${TAG}_verify2.log 2>&1
echo "verify2 exit: $?"
echo "=== SELFCHECK ==="
python3 tools/selfcheck.py /tmp/verify_${TAG}_t32 /root/testdata/sf0.01 > /tmp/${TAG}_selfcheck.log 2>&1
echo "selfcheck exit: $?"
echo "=== DETCOMPARE (strict) ==="
python3 tools/detcompare.py /tmp/verify_${TAG}_t2 /tmp/verify_${TAG}_t32 > /tmp/${TAG}_detcompare.log 2>&1
echo "detcompare exit: $?"
echo "=== SMOKE ==="
sbt -batch 'runMain graft.tools.Smoke' > /tmp/${TAG}_smoke.log 2>&1
echo "smoke exit: $?"
echo "=== WARNPROBE (full surface, bench conditions) ==="
SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.tools.WarnProbe /root/testdata/sf0.1' > /tmp/${TAG}_warnprobe.log 2>&1
echo "warnprobe exit: $?"
grep -c "WARN" /tmp/${TAG}_warnprobe.log
echo "=== BENCH ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Bench' > /tmp/${TAG}_bench.log 2>&1
echo "bench exit: $?"
echo "ALL DONE"
