#!/bin/bash
# Round-9 opportunistic 8->32 raw-gate attempt (bonus; the committed 2->8
# gate is the headline scaling evidence). Run IMMEDIATELY after another
# kernel-gated run passes its gate — i.e. inside a known-healthy window —
# with a single sched-only attempt (half the credit draw).
set -u
cd /root/repo
SPARK_GRAFT_SKIP_PACK=1 \
SPARK_GRAFT_SKIP_AMORT=1 \
SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_SKIP_ANN=1 \
SPARK_GRAFT_SKIP_LOW=1 \
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_BENCH_ATTEMPTS=1 \
SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_MAXWAIT=300 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r9_oppo.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r9_oppo.log 2>&1
echo "[r9oppo] done, exit=$?"
