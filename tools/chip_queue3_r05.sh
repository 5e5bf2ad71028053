#!/bin/bash
# Round-5 THIRD chip queue: queue2 fired during a flapping tunnel window —
# the liveness probe passed marginally (151 s data roundtrip), the leak
# probe's stricter preflight then failed, and the script moved on instead
# of retrying.  This queue fixes that: it retries the WHOLE sequence until
# each step actually produced its evidence (leak-probe rows; a bench
# "metric" line), or the deadline passes.
set -u
out=/tmp/chip3_r05
mkdir -p "$out"
cd "$(dirname "$0")/.."

deadline=$(( $(date +%s) + ${QUEUE_MAX_WAIT_SECS:-18000} ))
leak_done=0
bench_done=0
n=0
while { [ $leak_done -eq 0 ] || [ $bench_done -eq 0 ]; } && \
      [ "$(date +%s)" -lt "$deadline" ]; do
    n=$((n+1))
    timeout 180 python tools/chip_probe.py "$n" >"$out/probe.txt" 2>&1
    rc=$?
    cat "$out/probe.txt" | tail -1
    if [ $rc -ne 0 ]; then
        echo "probe rc=$rc (attempt $n); sleeping 300s"
        sleep 300
        continue
    fi
    # require a healthy data plane, not a marginal one: the probe line is
    # "LIVE data=XXs compile=YYs ..." — skip this window above 60 s
    data_s=$(grep -o 'data=[0-9.]*' "$out/probe.txt" | head -1 | cut -d= -f2)
    if [ -n "$data_s" ] && awk "BEGIN{exit !($data_s > 60)}"; then
        echo "data plane degraded (${data_s}s); sleeping 300s"
        sleep 300
        continue
    fi
    if [ $leak_done -eq 0 ]; then
        echo "== leak probe (attempt $n) =="
        timeout 1800 python tools/leak_probe_chip.py --iters 10 --mb 40 \
            >"$out/leak_probe_chip.txt" 2>&1
        if grep -q '"rss_mb"' "$out/leak_probe_chip.txt"; then
            leak_done=1
            tail -11 "$out/leak_probe_chip.txt"
        else
            echo "leak probe produced no rows:"
            tail -2 "$out/leak_probe_chip.txt"
            sleep 120
            continue
        fi
    fi
    if [ $bench_done -eq 0 ]; then
        echo "== bench refresh (attempt $n) =="
        timeout 3600 python bench.py >"$out/bench.json" 2>"$out/bench_detail.txt"
        if grep -q '"metric"' "$out/bench.json" && \
           ! grep -q '"value": 0' "$out/bench.json"; then
            bench_done=1
            cat "$out/bench.json"
        else
            echo "bench did not produce a healthy line:"
            tail -c 400 "$out/bench.json"
            sleep 120
        fi
    fi
done
[ $leak_done -eq 1 ] && [ $bench_done -eq 1 ] && \
    echo "== queue3 done ==" || echo "== queue3 INCOMPLETE (leak=$leak_done bench=$bench_done) =="
