#!/bin/bash
# Round-5 queued on-chip measurement sequence (run when the axon tunnel
# recovers; see CLAUDE.md Round-5 state for why each item is queued).
#
#   1. liveness probe (data plane + compile service)
#   2. python bench.py              — re-measure WITH the deferred event
#                                     readback (classified target >=90% of
#                                     same-run e2e median) + cache-warm the
#                                     driver's round-end bench
#   3. tools/rpca_fixed_ab.py       — VERDICT r4 #4a: dynamic while_loop vs
#                                     fixed-trip fori_loop IALM, interleaved
#   4. tools/soak_chip.py 30 min    — VERDICT r4 #7: long on-chip soak with
#                                     per-pass RSS + device-mem curves
#
# Artifacts land in /tmp/chip_r05/ (bench) and the repo root (A/B, soak).
set -u
out=/tmp/chip_r05
mkdir -p "$out"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 180 python tools/chip_probe.py || { echo "chip not usable (rc=$?)"; exit 2; }

echo "== bench (deferred-readback classified + cache-warm) =="
timeout 3600 python bench.py >"$out/bench.json" 2>"$out/bench_detail.json"
cat "$out/bench.json"

echo "== rpca fixed-trip A/B (VERDICT r4 #4a) =="
timeout 2400 python tools/rpca_fixed_ab.py --reps 3 \
    --out RPCA_FIXED_AB_r05.json | tail -5

echo "== 30-min soak with memory curves (VERDICT r4 #7) =="
timeout 3600 python tools/soak_chip.py --min-wall-secs 1800 \
    --out SOAK_r05_chip.json | tail -3

echo "== queue done =="
