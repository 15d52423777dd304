#!/bin/bash
# Round-7 scaling run 5 (contingency if run 4 doesn't gate sched):
# same kernel-probe polling strategy as run 4 (SPIN_MIN=0 — the cheap
# kernel control IS the window gate; an abort costs ~10 s) but stretched
# over a much longer horizon: 20 attempts with 12-min backoffs ≈ 4 h of
# polling. The sched gate (eff ≥0.8 with kernel ≥0.7 on the SAME
# attempt) needs a window where the 8-leg sits mid-range while the
# 32-leg is strong (r6 run C: 8.95M→28.68M) — more independent draws is
# the only lever left; every other variable is already controlled.
set -u
cd /root/repo
REST=${1:-900}
echo "[run5] resting ${REST}s before first attempt (credit refill)"
sleep "$REST"
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_SKIP_PACK=1 SPARK_GRAFT_SKIP_AMORT=1 SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ATTEMPTS=20 \
SPARK_GRAFT_BENCH_SPIN_MIN=0 SPARK_GRAFT_BENCH_MAXWAIT=14400 \
SPARK_GRAFT_BENCH_BACKOFF=720 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r7_run5.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r7_run5.log 2>&1
echo "[run5] done, exit=$?"
