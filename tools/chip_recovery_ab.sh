#!/bin/bash
# Queued on-chip measurement sequence for when the axon tunnel recovers
# (see CLAUDE.md rig notes: the tunnel goes fully dark for hours; the
# enum-LAP default flip is gated on these numbers).  Run from the repo
# root.  Artifacts land in /tmp/chip_recovery/.
#
#   1. liveness probe (data plane + compile service)
#   2. python bench.py          — cache-warms the driver's round-end bench
#                                 (the r3 tracker refactor changed
#                                 track_window's HLO -> fresh compiles)
#   3. tools/tracker_budget.py  — full/enum/nolap interleaved A/B; flip
#                                 config.track_enum_lap to 4 ONLY if
#                                 enum_speedup_dense > 1 on chip, then
#                                 re-run bench.py with the flip so the
#                                 driver's bench stays cache-warm
set -u
out=/tmp/chip_recovery
mkdir -p "$out"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 180 python tools/chip_probe.py || { echo "chip not usable (rc=$?)"; exit 2; }

echo "== bench (cache-warm + headline) =="
timeout 3000 python bench.py >"$out/bench.json" 2>"$out/bench_detail.json"
cat "$out/bench.json"

echo "== tracker budget (full/enum/stacked/nolap interleaved) =="
timeout 1800 python tools/tracker_budget.py --iters 8 >"$out/tracker_budget.json"
cat "$out/tracker_budget.json"

echo "== tracker budget, chunk=8 (backlog 0: chunked x enum re-sweep) =="
timeout 1800 python tools/tracker_budget.py --iters 8 --chunk 8 >"$out/tracker_budget_chunk8.json"
cat "$out/tracker_budget_chunk8.json"

echo "== decision hint =="
python - "$out/tracker_budget.json" <<'PY'
import json, sys
# the summary line is the LAST json object in the stream
d = [json.loads(l) for l in open(sys.argv[1]) if l.strip()][-1]
for key, flag, new in (
    ("enum_speedup_dense", "track_enum_lap", 4),
    ("stacked_speedup_dense", "track_stacked_ops", True),
    ("enumstk_speedup_dense", "track_enum_lap=4 + track_stacked_ops", True),
):
    s = d.get(key)
    print(f"{key}={s}: "
          + (f"FLIP {flag} default to {new} and re-run bench.py"
             if s and s > 1.05 else "keep default"))
PY
