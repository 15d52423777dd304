#!/bin/bash
# Round-7 scaling run 4: sched-only, kernel-probe polling strategy.
# Run 3 proved the spin probe cannot certify a window (three healthy
# spins -> kernel aborts), so SPIN_MIN=0 skips spin-waiting entirely and
# lets the cheap kernel control gate each attempt: a kernel-abort costs
# ~10 s and the 600 s backoff turns the attempt loop into "poll the real
# control every 10 min" — more rested draws per wall-clock hour than any
# fixed pre-sleep, after one initial deep rest.
set -u
cd /root/repo
REST=${1:-2100}
echo "[run4] resting ${REST}s before first attempt (credit refill)"
sleep "$REST"
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_SKIP_PACK=1 SPARK_GRAFT_SKIP_AMORT=1 SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ATTEMPTS=8 \
SPARK_GRAFT_BENCH_SPIN_MIN=0 SPARK_GRAFT_BENCH_MAXWAIT=4800 \
SPARK_GRAFT_BENCH_BACKOFF=600 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r7_run4.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r7_run4.log 2>&1
echo "[run4] done, exit=$?"
