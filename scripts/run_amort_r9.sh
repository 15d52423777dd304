#!/bin/bash
# Round-9 rested-host amortization rerun (r8 verdict #2, second half).
# The r9 full-pack run's amort points were degraded-host samples (kernel
# control 0.27 for the whole session; xlarge 19-26k vs the 39.7-43.6k
# healthy range). This run embeds the same kernel gate INSIDE amort-only
# mode and WAITS for a healthy window: probes every 600 s (150 s probing
# had a 10-15% heavy duty cycle that kept the pool drained), budget 1h.
set -u
cd /root/repo
SPARK_GRAFT_AMORT_ONLY=1 \
SPARK_GRAFT_AMORT_XXL=1 \
SPARK_GRAFT_PACK_KERNEL_MIN=0.7 \
SPARK_GRAFT_PACK_MAXWAIT=3600 \
SPARK_GRAFT_PACK_PROBE_INTERVAL=600 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/amort_r9_run1.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/amort_r9_run1.log 2>&1
echo "[r9amort] done, exit=$?"
