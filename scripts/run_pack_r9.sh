#!/bin/bash
# Round-9 full pack + quality-block run, HOST-HEALTH GATED (r8 verdict #2):
# the run refuses to start timing until the 8->32 kernel thread control
# reads >= 0.7 (PACK_KERNEL_MIN) — committed pack artifacts are then never
# degraded-host samples. Includes the xxl amortization point, the
# throttle-immune 2->8 scaling gate, band sweep, corpus pipeline, and the
# interleaved resume A/B. 8->32 attempts bounded at 2 (opportunistic
# bonus; the 2->8 gate is the headline scaling evidence).
set -u
cd /root/repo
SPARK_GRAFT_PACK_KERNEL_MIN=0.7 \
SPARK_GRAFT_PACK_MAXWAIT=2400 \
SPARK_GRAFT_AMORT_XXL=1 \
SPARK_GRAFT_BENCH_ATTEMPTS=2 \
SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_full_r9.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/pack_r9_run1.log 2>&1
echo "[r9pack] done, exit=$?"
