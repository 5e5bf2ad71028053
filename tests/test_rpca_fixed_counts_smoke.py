"""Small-N smoke of the rpca_fixed_iters count-equality campaign: the
committed RPCA_FIXED_COUNTS_rNN.json artifacts come from
tools/rpca_fixed_counts.py — this keeps that campaign from silently
rotting between rounds (same pattern as test_parity_fuzz_smoke).

Two scenes (one device-tracker, one host) through the full campaign code
path, asserting zero count divergences between the shipped dynamic IALM
and the opt-in fixed-trip knob, and that the crash-safe incremental
artifact lands."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_rpca_fixed_counts_campaign_smoke(tmp_path):
    import rpca_fixed_counts

    out = tmp_path / "rfc_smoke.json"
    summary = rpca_fixed_counts.run_campaign(
        scenes=2, fixed_iters=15, campaign_seed=20260820, out=str(out)
    )
    assert summary["mismatches"] == 0
    assert summary["scenes"] == 2
    assert {r["tracker"] for r in summary["results"]} == {"device", "host"}
    on_disk = json.loads(out.read_text())
    assert on_disk["mismatches"] == 0
    assert len(on_disk["results"]) == 2
