"""tools/evaluate.py: the report-§4.2 accuracy evaluation harness.

The reference never shipped its scoring code; these tests pin the rebuilt
methodology's arithmetic (validated against the report's own identities in
BASELINE.md: TP + FP == predicted, TP + missed == actual, P = TP/(TP+FP),
R = TP/(TP+missed)) and golden-test the harness end-to-end on a synthetic
video whose ground truth is constructed.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

import evaluate  # noqa: E402

from swiftwatcher_tpu.io.export import dataframe_to_csv, frame_timestamp  # noqa: E402


def _frame_df(rows):
    """rows: [(framenumber, predicted, rejected)] -> export-format frame."""
    idx = pd.MultiIndex.from_tuples(
        [(frame_timestamp(fn, 30.0), fn) for fn, _, _ in rows],
        names=["timestamp", "framenumber"],
    )
    return pd.DataFrame(
        {
            "predicted": [p for _, p, _ in rows],
            "rejected": [r for _, _, r in rows],
        },
        index=idx,
    )


def test_score_arithmetic_identities():
    s = evaluate.Score(tp=659, fp=390, missed=67)
    # the May 18 row of report Table 3/5 (BASELINE.md): det-only predicted
    # 1049, actual 726, P/R as published
    assert s.predicted == 1049
    assert s.actual == 726
    assert abs(s.precision - 659 / 1049) < 1e-12
    assert abs(s.recall - 659 / 726) < 1e-12
    assert abs(s.f1 - 2 * s.precision * s.recall / (s.precision + s.recall)) < 1e-12
    z = evaluate.Score(tp=0, fp=0, missed=0)
    assert z.precision == z.recall == z.f1 == 0.0


def test_binwise_matching_granularity():
    # two predictions in the same second as one actual: at 'second'
    # granularity one is TP and one FP; at 'minute' both collapse with a
    # same-minute actual elsewhere
    res = _frame_df([(10, 1, 0), (12, 1, 0), (400, 0, 1)])
    gt = _frame_df([(11, 1, 0), (410, 1, 0)])
    act = evaluate._count_series(gt, evaluate.GT_COLUMNS, "second")
    # detection+classification at second granularity:
    det_c = evaluate.score_counts(
        evaluate._count_series(res, ("predicted",), "second"), act
    )
    assert (det_c.tp, det_c.fp, det_c.missed) == (1, 1, 1)
    # detection-only picks up the rejected event at frame 400 (same second
    # as the actual at 410: frames 400/410 are both in second 13)
    det = evaluate.score_counts(
        evaluate._count_series(res, ("predicted", "rejected"), "second"), act
    )
    assert (det.tp, det.fp, det.missed) == (2, 1, 0)
    # at video granularity counts pool: 2 predicted vs 2 actual
    det_v = evaluate.score_counts(
        evaluate._count_series(res, ("predicted", "rejected"), "video"),
        evaluate._count_series(gt, evaluate.GT_COLUMNS, "video"),
    )
    assert (det_v.tp, det_v.fp, det_v.missed) == (2, 1, 0)


def test_exact_granularity_is_strict():
    res = _frame_df([(10, 1, 0)])
    gt = _frame_df([(11, 1, 0)])
    s = evaluate.score_counts(
        evaluate._count_series(res, ("predicted",), "exact"),
        evaluate._count_series(gt, evaluate.GT_COLUMNS, "exact"),
    )
    assert (s.tp, s.fp, s.missed) == (0, 1, 1)


@pytest.fixture(scope="module")
def exported_run(tmp_path_factory):
    """One synthetic-video pipeline run with results exported."""
    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    out = tmp_path_factory.mktemp("eval_e2e")
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1)
    res = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, export_dir=out,
    )
    assert res.total_predicted == video.n_entering == 2
    return out, res


def test_golden_self_groundtruth(exported_run, tmp_path):
    """GT constructed from the run's own predicted events: det+class must
    score perfectly; detection-only shows the rejected distractor as FP."""
    out, res = exported_run
    labels = res.df_labels
    gt = labels[labels["label"] > 0][["events"]].rename(
        columns={"events": "predicted"}
    )
    gt_path = tmp_path / "gt.csv"
    dataframe_to_csv(gt, gt_path)
    scores = evaluate.evaluate_pair(out, gt_path, "second")
    dc = scores["detection+classification"]
    assert (dc.tp, dc.fp, dc.missed) == (2, 0, 0)
    assert dc.precision == dc.recall == dc.f1 == 1.0
    # detection-only additionally counts every REJECTED event as a
    # prediction (report Table 3); the synthetic crossers usually exit the
    # frame eventless, so derive the expectation from the run
    det = scores["detection"]
    assert det.tp == 2 and det.missed == 0
    assert det.fp == res.total_rejected
    assert det.recall == 1.0
    assert det.precision == pytest.approx(2 / (2 + res.total_rejected))


def test_golden_phantom_and_shift(exported_run, tmp_path):
    """A phantom GT event nobody predicted becomes a miss; recall drops."""
    out, res = exported_run
    labels = res.df_labels
    gt = labels[labels["label"] > 0][["events"]].rename(
        columns={"events": "predicted"}
    )
    phantom = pd.DataFrame(
        {"predicted": [1]},
        index=pd.MultiIndex.from_tuples(
            [(frame_timestamp(60, 30.0), 60)],
            names=["timestamp", "framenumber"],
        ),
    )
    gt_path = tmp_path / "gt_phantom.csv"
    dataframe_to_csv(pd.concat([gt, phantom]), gt_path)
    dc = evaluate.evaluate_pair(out, gt_path, "second")[
        "detection+classification"
    ]
    assert (dc.tp, dc.fp, dc.missed) == (2, 0, 1)
    assert dc.recall == 2 / 3 and dc.precision == 1.0


def test_cli_json_and_avg(exported_run, tmp_path):
    """The command line produces the Table-3/6-style report, including the
    AVG row for multiple videos, and a machine-readable --json form."""
    out, res = exported_run
    labels = res.df_labels
    gt = labels[labels["label"] > 0][["events"]].rename(
        columns={"events": "predicted"}
    )
    gt_path = tmp_path / "gt.csv"
    dataframe_to_csv(gt, gt_path)
    proc = subprocess.run(
        [
            sys.executable, str(TOOLS / "evaluate.py"),
            "--pairs", f"{out}:{gt_path}:vidA", f"{out}:{gt_path}:vidB",
            "--json",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    data = json.loads(proc.stdout)
    assert data["vidA"]["detection+classification"]["f1"] == 1.0
    assert data["AVG"]["detection+classification"]["f1"] == 1.0
    assert data["AVG"]["detection"]["precision"] == pytest.approx(
        2 / (2 + res.total_rejected)
    )
    # human-readable table form
    proc = subprocess.run(
        [
            sys.executable, str(TOOLS / "evaluate.py"),
            "--results", str(out), "--groundtruth", str(gt_path),
            "--name", "May 18",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "detection+classification" in proc.stdout
    assert "May 18" in proc.stdout
