"""Small-N smoke of the mesh-geometry sharding fuzz: the committed
MESH_FUZZ_rNN.json artifacts come from tools/mesh_fuzz.py — this keeps
that campaign from silently rotting between rounds (same pattern as the
parity-fuzz and rpca-fixed-counts smokes).

Two scenes (one (2,1) data-sharded, one (4,1)) through the full campaign
code path on the suite's 8-virtual-device CPU mesh, asserting
sharded-vs-unsharded event equality and the crash-safe artifact."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_mesh_fuzz_campaign_smoke(tmp_path):
    import mesh_fuzz

    out = tmp_path / "mf_smoke.json"
    summary = mesh_fuzz.run_campaign(
        scenes=2, campaign_seed=20260820, out=str(out)
    )
    assert summary["mismatches"] == 0
    assert summary["scenes"] == 2
    assert [r["mesh"] for r in summary["results"]] == [[2, 1], [4, 1]]
    on_disk = json.loads(out.read_text())
    assert on_disk["mismatches"] == 0
    assert len(on_disk["results"]) == 2
