#!/bin/bash
# Round-7 scaling run 3: sched-only retry for the one missing gate
# (sched >= 0.8 with kernel >= 0.7 on the same attempt).
# Sleeps first: only true idle restores the host's burst credits
# (BASELINE.md); the spin probe alone reads healthy on a drained host.
set -u
cd /root/repo
REST=${1:-1500}
echo "[run3] resting ${REST}s before first attempt (credit refill)"
sleep "$REST"
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_SKIP_PACK=1 SPARK_GRAFT_SKIP_AMORT=1 SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ATTEMPTS=4 \
SPARK_GRAFT_BENCH_SPIN_MIN=16 SPARK_GRAFT_BENCH_MAXWAIT=1800 \
SPARK_GRAFT_BENCH_BACKOFF=420 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r7_run3.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r7_run3.log 2>&1
echo "[run3] done, exit=$?"
