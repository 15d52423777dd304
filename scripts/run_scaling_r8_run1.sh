#!/bin/bash
# Round-8 scaling run 1: sched-only attempts with the NEW per-attempt
# membw-normalized efficiency (sched_eff_norm = sched_eff_best/membw_eff).
# Done-criteria (r7 verdict #1): EITHER one attempt with sched_eff_best
# >= 0.8 and kernel >= 0.7 (sched_gated: true), OR >= 3 attempts with
# sched_eff_norm >= 0.85 and kernel >= 0.7 (sched_norm_gated_attempts
# >= 3). The harness stops as soon as EITHER criterion is met (the done
# loop counts schedNormGatedIn attempts and exits at >= 3), so the
# ATTEMPTS argument is an upper bound, not a fixed campaign length.
# (Comment corrected per r8 ADVICE — the artifact's provenance is
# "up to N attempts, early-stop on pass".)
# Kernel-probe polling (SPIN_MIN=0: the ~10 s kernel control is the
# window gate), 10-min backoffs between attempts.
set -u
cd /root/repo
REST=${1:-900}
ATTEMPTS=${2:-12}
echo "[r8run1] resting ${REST}s before first attempt (credit refill)"
sleep "$REST"
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_SKIP_PACK=1 SPARK_GRAFT_SKIP_AMORT=1 SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ATTEMPTS="$ATTEMPTS" \
SPARK_GRAFT_BENCH_SPIN_MIN=0 SPARK_GRAFT_BENCH_MAXWAIT=14400 \
SPARK_GRAFT_BENCH_BACKOFF=600 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r8_run1.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r8_run1.log 2>&1
echo "[r8run1] done, exit=$?"
