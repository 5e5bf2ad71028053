"""Small-N smoke of the checkpoint/resume fuzz campaign: the committed
RESUME_FUZZ_rNN.json artifacts come from tools/resume_fuzz.py — this
keeps that campaign from silently rotting between rounds (same pattern as
the other campaign smokes).

Three scenes cover the three rotation arms in one pass: a filtered host
run, an unfiltered host run, and an unfiltered device-tracker run, each
interrupted at a random frame and resumed."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_resume_fuzz_campaign_smoke(tmp_path):
    import resume_fuzz

    out = tmp_path / "rf_smoke.json"
    summary = resume_fuzz.run_campaign(
        scenes=3, campaign_seed=20260820, out=str(out)
    )
    assert summary["mismatches"] == 0
    assert summary["scenes"] == 3
    assert all(r["checkpoint_written"] for r in summary["results"])
    # the rotation covered both trackers and the filtered arm
    assert {r["tracker"] for r in summary["results"]} == {"device", "host"}
    assert any(r["filtered"] for r in summary["results"])
    on_disk = json.loads(out.read_text())
    assert on_disk["mismatches"] == 0
    assert len(on_disk["results"]) == 3
