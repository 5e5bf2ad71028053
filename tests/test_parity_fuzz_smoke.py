"""Small-N smoke of the parity-fuzz campaign (VERDICT r4 #3): the committed
PARITY_FUZZ_rNN.json artifacts come from tools/parity_fuzz.py — this keeps
that campaign from silently rotting between rounds.

Two scenes (one device-tracker, one host) + the classify subset on scene 0,
same code path as the full campaign (run_campaign), asserting zero
mismatches and that the incremental artifact lands after every scene."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_parity_fuzz_campaign_smoke(tmp_path):
    import parity_fuzz

    out = tmp_path / "pf_smoke.json"
    summary = parity_fuzz.run_campaign(
        scenes=2, campaign_seed=20260820, out=str(out), classify_every=2
    )
    assert summary["mismatches"] == 0
    assert summary["scenes"] == 2
    # classify subset ran on scene 0 and agreed across trackers
    assert summary["results"][0]["classify_ok"] is True
    # crash-safe artifact: file exists and round-trips
    on_disk = json.loads(out.read_text())
    assert on_disk["mismatches"] == 0
    assert len(on_disk["results"]) == 2
