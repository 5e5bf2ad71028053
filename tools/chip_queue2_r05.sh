#!/bin/bash
# Round-5 SECOND chip queue: the work still needing the real chip after
# the 09:51 tunnel outage.  Retries the liveness probe until the tunnel
# recovers (or a deadline passes), then runs:
#
#   1. tools/leak_probe_chip.py — zero-pipeline device_put/readback loop
#      to close the SOAK_r05 RSS attribution (pipeline already ruled out
#      by the flat CPU control; this isolates the tunnel client).
#   2. python bench.py          — full refresh WITH the new
#      resident_tracked_fixed_rpca metric + cache-warm for the driver's
#      round-end bench run.
#
# Outputs land in /tmp/chip2_r05/; artifacts are folded into the repo by
# the session afterwards (not by this script — keep the repo edits
# reviewable).
set -u
out=/tmp/chip2_r05
mkdir -p "$out"
cd "$(dirname "$0")/.."

deadline=$(( $(date +%s) + ${QUEUE_MAX_WAIT_SECS:-14400} ))
n=0
while true; do
    n=$((n+1))
    timeout 180 python tools/chip_probe.py "$n" >"$out/probe.txt" 2>&1
    rc=$?
    cat "$out/probe.txt"
    [ $rc -eq 0 ] && break
    if [ "$(date +%s)" -ge "$deadline" ]; then
        echo "QUEUE_TIMEOUT: tunnel never recovered" | tee "$out/status.txt"
        exit 2
    fi
    echo "probe rc=$rc (attempt $n); sleeping 300s"
    sleep 300
done

echo "== leak probe (zero-pipeline transfer loop) =="
timeout 1800 python tools/leak_probe_chip.py --iters 10 --mb 40 \
    | tee "$out/leak_probe_chip.txt"

echo "== bench refresh (fixed-rpca metric + cache-warm) =="
timeout 3600 python bench.py >"$out/bench.json" 2>"$out/bench_detail.txt"
rc=$?
echo "bench rc=$rc"
cat "$out/bench.json"
echo "== queue2 done ==" | tee "$out/status.txt"
