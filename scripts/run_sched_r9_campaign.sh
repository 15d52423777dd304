#!/bin/bash
# Round-9 kernel-gated 8->32 sched-only campaign chasing the normalized
# criterion (>=3 attempts: sched_eff_norm >=0.85 AND kernel >=0.7 AND
# membw32 >= 170 GB/s floor). Non-final attempts abort cheaply on a
# failing kernel control; 600 s inter-attempt backoff lets the credit
# pool refill between probes (the amort-rerun finding: tighter probing
# keeps the pool drained). The loop also stops early on the raw gate.
# Headline scaling evidence stays the committed 2->8 gate; this is the
# opportunistic bonus the r8 verdict asked to keep running.
set -u
cd /root/repo
SPARK_GRAFT_SKIP_PACK=1 \
SPARK_GRAFT_SKIP_AMORT=1 \
SPARK_GRAFT_SKIP_RESUME=1 \
SPARK_GRAFT_SKIP_ANN=1 \
SPARK_GRAFT_SKIP_LOW=1 \
SPARK_GRAFT_SCHED_ONLY=1 \
SPARK_GRAFT_BENCH_ATTEMPTS=6 \
SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_MAXWAIT=3600 \
SPARK_GRAFT_BENCH_BACKOFF=600 \
SPARK_GRAFT_BENCH_REP_REST=60 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/scaling_r9_campaign1.json \
sbt -batch "runMain graft.Bench" > /root/repo/bench/scaling_r9_campaign1.log 2>&1
echo "[r9campaign] done, exit=$?"
