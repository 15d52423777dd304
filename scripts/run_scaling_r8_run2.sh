#!/bin/bash
# Round-8 scaling run 2: per-rep burst-window hygiene.
# Run 1 (bench/scaling_r8_run1.json) showed the bind: the 8-leg is
# throttle-immune (9.0-9.8M in every window) while back-to-back 32-leg
# reps measure progressively drained burst budgets (23.4M best vs the
# 29.7M record). This run adds SPARK_GRAFT_BENCH_REP_REST=90 — 90 s of
# idle before EACH 32-leg rep (untimed, exactly like the inter-attempt
# backoff) so best-of-reps picks a whole-burst window — plus longer
# backoffs (15 min; run 1's 10-min backoffs never restored the kernel
# control past 0.686 on 12 of 14 attempts).
set -u
cd /root/repo
REST=${1:-1500}
ATTEMPTS=${2:-6}
echo "[r8run2] resting ${REST}s before first attempt (credit refill)"
sleep "$REST"
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_SKIP_PACK=1 SPARK_GRAFT_SKIP_AMORT=1 SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ATTEMPTS="$ATTEMPTS" \
SPARK_GRAFT_BENCH_SPIN_MIN=0 SPARK_GRAFT_BENCH_MAXWAIT=14400 \
SPARK_GRAFT_BENCH_BACKOFF=900 \
SPARK_GRAFT_BENCH_REP_REST=90 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r8_run2.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r8_run2.log 2>&1
echo "[r8run2] done, exit=$?"
