#!/bin/bash
# Round-9 throttle-immune scaling gate (r8 verdict, next-round #1): the
# identical frontier-scheduling job at local[2] and local[8]. The sandbox
# never throttles <=8-thread load (BASELINE.md round-1 policy, reconfirmed
# every round), so this 4x ratio is burst-credit-immune by construction —
# no credit-window polling, no backoff loop needed. Gate:
# sched_2to8_eff_best >= 0.8 AND kernel_2to8_eff >= 0.7 (the same-thread-
# count kernel control rides in the artifact).
set -u
cd /root/repo
SPARK_GRAFT_LOW_ONLY=1 \
SPARK_GRAFT_BENCH_REPS=${1:-3} \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_low_r9_run1.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_low_r9_run1.log 2>&1
echo "[r9low] done, exit=$?"
