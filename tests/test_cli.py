"""The console entry point end-to-end (swiftwatcher_tpu/__main__.py).

The e2e suites drive run_video directly; these cover the L5 wiring the
reference exposes to users (__main__.py:13-53 there): argv parsing, corner
resolution from attributes.json, per-video export next to the video, the
summary lines, and the extension flags' failure modes."""

import json
from pathlib import Path

import numpy as np
import pytest

from swiftwatcher_tpu.__main__ import main
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu import ui


@pytest.fixture(autouse=True, scope="module")
def _isolated_compile_cache(tmp_path_factory):
    """main() enables the persistent XLA compile cache; the suite's CPU
    programs must go to a throwaway dir, not the production axon cache
    (mixing them correlated with XLA CPU compile segfaults late in the
    suite)."""
    import os

    old = os.environ.get("SWTPU_COMPILE_CACHE")
    os.environ["SWTPU_COMPILE_CACHE"] = str(tmp_path_factory.mktemp("xla_cache"))
    yield
    if old is None:
        os.environ.pop("SWTPU_COMPILE_CACHE", None)
    else:
        os.environ["SWTPU_COMPILE_CACHE"] = old
    # main() enables the cache globally; turn it back off so the REST of
    # the suite compiles without the persistent-cache read/write layer
    import jax

    jax.config.update("jax_compilation_cache_dir", None)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    video = make_video(seed=3, n_frames=63, n_entering=2, n_crossing=1)
    p = td / "clip.npy"
    np.save(p, video.frames)
    ui.save_corners_to_file(p, video.corners)
    return p


def test_cli_counts_and_exports(clip, capsys):
    rc = main(["--filepaths", str(clip), "--tracker", "host"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "predicted" in out and "rejected" in out
    out_dir = clip.parent / clip.stem
    csvs = list(out_dir.glob("*swifts*_sec.csv"))
    assert csvs, f"no exported CSVs in {out_dir}"
    # corners round-tripped through the same attributes.json the reference
    # writes (ui.py:180-208 there)
    attrs = json.loads((out_dir / "attributes.json").read_text())
    assert len(attrs["corners"]) == 2


def test_cli_set_overrides_and_device_tracker(clip, capsys):
    rc = main(
        [
            "--filepaths", str(clip),
            "--tracker", "device",
            "--set", "batch_windows=2",
            "--set", "track_enum_lap=4",
        ]
    )
    assert rc == 0
    assert "predicted" in capsys.readouterr().out


def test_cli_bad_set_field_raises(clip):
    with pytest.raises(ValueError):
        main(["--filepaths", str(clip), "--set", "no_such_field=1"])


def test_cli_mesh_validation(clip, capsys):
    assert main(["--filepaths", str(clip), "--mesh", "banana"]) == 2
    assert "--mesh must look like" in capsys.readouterr().err
    assert main(["--filepaths", str(clip), "--mesh", "64x64"]) == 2
    assert "devices" in capsys.readouterr().err


def test_cli_mesh_runs_sharded(clip, capsys):
    """--mesh 2 on the CPU test mesh: CLI parse -> make_mesh -> sharded
    localization -> counts equal the unsharded run."""
    rc = main(
        ["--filepaths", str(clip), "--set", "batch_windows=2", "--mesh", "2"]
    )
    assert rc == 0
    sharded = capsys.readouterr().out
    rc = main(["--filepaths", str(clip), "--set", "batch_windows=2"])
    assert rc == 0
    plain = capsys.readouterr().out
    line = [l for l in sharded.splitlines() if "predicted" in l]
    assert line and line == [l for l in plain.splitlines() if "predicted" in l]


def test_cli_accuracy_pack_preset(clip, capsys, monkeypatch):
    """--accuracy-pack = the three documented --set overrides, with an
    explicit --set still winning over the preset."""
    from swiftwatcher_tpu.config import ACCURACY_PACK_OVERRIDES
    import swiftwatcher_tpu.__main__ as entry

    seen = {}
    real = entry.config_with_overrides

    def spy(overrides, *a, **kw):
        seen["overrides"] = list(overrides)
        return real(overrides, *a, **kw)

    monkeypatch.setattr(entry, "config_with_overrides", spy)
    rc = main(
        [
            "--filepaths", str(clip),
            "--accuracy-pack",
            "--set", "stabilize_max_shift=1",
            "--set", "batch_windows=2",
        ]
    )
    assert rc == 0
    assert "predicted" in capsys.readouterr().out
    # preset first, explicit --set after (later wins in
    # config_with_overrides)
    assert seen["overrides"][: len(ACCURACY_PACK_OVERRIDES)] == list(
        ACCURACY_PACK_OVERRIDES
    )
    cfg = real(seen["overrides"])
    assert cfg.angle_band_halfwidth == 60.0
    assert cfg.false_angle_min_disp == 5.0
    assert cfg.stabilize_max_shift == 1  # explicit --set overrode the preset
