"""Mid-video checkpoint/resume.

The reference keeps tracker state only in memory until export (SURVEY.md
§5: "no mid-video checkpoint") — a 60-minute 216k-frame video lost to a
crash restarts from zero.  The rebuild periodically serializes the frame
cursor, the live track table, and the detected events; `run_video` resumes
from the newest checkpoint when given the same path.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

from ..pipeline.tracking import Event, SegmentTracker, Track


def save_checkpoint(
    path: Path,
    next_frame_number: int,
    frames_processed: int,
    tracker: SegmentTracker,
) -> None:
    state = {
        "next_frame_number": int(next_frame_number),
        "frames_processed": int(frames_processed),
        "tracks": [
            {
                "centroid": list(t.centroid),
                "frame_number": int(t.frame_number),
                "timestamp": None if t.timestamp is None else str(t.timestamp),
                "hist_len": int(t.hist_len),
                "hist_first": None if t.hist_first is None else list(t.hist_first),
            }
            for t in tracker.prev
        ],
        "events": [
            {
                "first_centroid": list(e.first_centroid),
                "last_centroid": list(e.last_centroid),
                "frame_number": int(e.frame_number),
                "timestamp": None if e.timestamp is None else str(e.timestamp),
            }
            for e in tracker.events
        ],
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    tmp.replace(path)  # atomic


def save_checkpoint_device(
    path: Path,
    next_frame_number: int,
    frames_processed: int,
    dev_state,                      # pipeline.tracking_jax.TrackState
    events: List[Event],
) -> None:
    """Device-tracker variant: the live TrackState (fixed-capacity jnp
    arrays) plus the host-drained event list.  Same atomic-replace JSON
    format with a tracker_impl marker so host/device checkpoints cannot be
    cross-resumed silently."""
    import numpy as np

    state = {
        "tracker_impl": "device",
        "next_frame_number": int(next_frame_number),
        "frames_processed": int(frames_processed),
        "dev_state": {
            k: np.asarray(v).tolist() for k, v in dev_state._asdict().items()
        },
        "events": [
            {
                "first_centroid": list(e.first_centroid),
                "last_centroid": list(e.last_centroid),
                "frame_number": int(e.frame_number),
                "timestamp": None if e.timestamp is None else str(e.timestamp),
            }
            for e in events
        ],
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    tmp.replace(path)


def load_checkpoint_device(path: Path):
    """Returns (next_frame_number, frames_processed, TrackState, events)
    or None if no checkpoint exists.  Raises on a host-tracker checkpoint
    (resume with tracker_impl='host' instead)."""
    import jax.numpy as jnp
    import numpy as np

    from ..pipeline.tracking_jax import TrackState

    path = Path(path)
    if not path.exists():
        return None
    with open(path) as fh:
        state = json.load(fh)
    if state.get("tracker_impl") != "device":
        raise ValueError(
            f"{path} is a host-tracker checkpoint; resume it with "
            "tracker_impl='host' (state formats are not interchangeable)"
        )
    ds = state["dev_state"]
    dev_state = TrackState(
        cy=jnp.asarray(np.asarray(ds["cy"], np.float32)),
        cx=jnp.asarray(np.asarray(ds["cx"], np.float32)),
        valid=jnp.asarray(np.asarray(ds["valid"], bool)),
        hist_len=jnp.asarray(np.asarray(ds["hist_len"], np.int32)),
        first_cy=jnp.asarray(np.asarray(ds["first_cy"], np.float32)),
        first_cx=jnp.asarray(np.asarray(ds["first_cx"], np.float32)),
        fn=jnp.asarray(np.asarray(ds["fn"], np.int32)),
    )
    events = [
        Event(
            first_centroid=tuple(e["first_centroid"]),
            last_centroid=tuple(e["last_centroid"]),
            frame_number=e["frame_number"],
            timestamp=e["timestamp"],
        )
        for e in state["events"]
    ]
    return state["next_frame_number"], state["frames_processed"], dev_state, events


def load_checkpoint(path: Path, tracker: SegmentTracker) -> Optional[Tuple[int, int]]:
    """Restore tracker state in place; returns (next_frame_number,
    frames_processed) or None if no checkpoint exists."""
    import pandas as pd

    path = Path(path)
    if not path.exists():
        return None
    with open(path) as fh:
        state = json.load(fh)
    if state.get("tracker_impl") == "device":
        raise ValueError(
            f"{path} is a device-tracker checkpoint; resume it with "
            "tracker_impl='device' (state formats are not interchangeable)"
        )

    def ts(v):
        if v is None:
            return None
        try:
            return pd.Timestamp(v)
        except (ValueError, TypeError):
            return v

    tracker.prev = [
        Track(
            centroid=tuple(t["centroid"]),
            frame_number=t["frame_number"],
            timestamp=ts(t["timestamp"]),
            hist_len=t["hist_len"],
            hist_first=None if t["hist_first"] is None else tuple(t["hist_first"]),
        )
        for t in state["tracks"]
    ]
    tracker.events = [
        Event(
            first_centroid=tuple(e["first_centroid"]),
            last_centroid=tuple(e["last_centroid"]),
            frame_number=e["frame_number"],
            timestamp=ts(e["timestamp"]),
        )
        for e in state["events"]
    ]
    return state["next_frame_number"], state["frames_processed"]
