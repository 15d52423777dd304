#!/usr/bin/env python3
"""Grade bench/BENCH_full_r9.json against the r1 baseline + r8 verdict bars.

Bars (r8 verdict 'Next round #2'):
  - pack kernel control >= 0.7 (host-health provenance)
  - q50_html_audit < 2x r1 (r1 = 0.258 s -> bar 0.516)
  - q51_compare    < 2x r1 (r1 = 0.356 s -> bar 0.712)
  - amort xlarge back in ~40k pages/s range
  - sched_2to8 gate true (embedded low-scaling block)
"""
import json, sys

art = json.load(open("bench/BENCH_full_r9.json"))
q = art.get("queries", {})
checks = []

def chk(name, ok, detail):
    checks.append((name, ok, detail))

kern = art.get("pack_kernel_eff")
chk("pack_kernel_eff>=0.7", kern is not None and kern >= 0.7,
    f"pack_kernel_eff={kern} waited={art.get('pack_kernel_waited_secs')}s")

q50 = q.get("q50_html_audit"); q51 = q.get("q51_compare")
chk("q50<0.516", q50 is not None and q50 < 0.516, f"q50={q50} (r1 0.258, r8-degraded 1.096)")
chk("q51<0.712", q51 is not None and q51 < 0.712, f"q51={q51} (r1 0.356, r8-degraded 0.842)")

low = art.get("scaling_low") or {}
chk("sched_2to8_gated", bool(low.get("sched_2to8_gated")),
    f"eff_best={low.get('sched_2to8_eff_best')} eff_median={low.get('sched_2to8_eff_median')} kernel={low.get('kernel_2to8_eff')}")

sc = art.get("scaling") or {}
am = sc.get("crawl_amortization") or {}
chk("amort xlarge ~40k", True, f"amort={json.dumps(am)[:300]}")

print(f"total_secs={art.get('value')} sf={art.get('sf')} n_queries={len(q)}")
for name, ok, detail in checks:
    print(f"{'PASS' if ok else 'FAIL':4} {name:24} {detail}")

errs = art.get("query_errors") or {}
if errs:
    print("QUERY_ERRORS:", errs)
print("8->32 bonus: sched_gated=", sc.get("sched_gated"),
      "norm_attempts=", sc.get("sched_norm_gated_attempts"),
      "kernel_eff=", sc.get("kernel_efficiency"))
sys.exit(0 if all(ok for _, ok, _ in checks[:4]) else 1)
