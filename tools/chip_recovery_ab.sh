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

echo "== tracker budget (full/enum/nolap interleaved) =="
timeout 1800 python tools/tracker_budget.py --iters 8 >"$out/tracker_budget.json"
cat "$out/tracker_budget.json"

echo "== decision hint =="
python - "$out/tracker_budget.json" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
s = d.get("enum_speedup_dense")
print(f"enum_speedup_dense={s}: "
      + ("FLIP track_enum_lap default to 4 and re-run bench.py"
         if s and s > 1.05 else "keep default 0"))
PY
