"""Mid-video checkpoint/resume.

The reference keeps tracker state only in memory until export (SURVEY.md
§5: "no mid-video checkpoint") — a 60-minute 216k-frame video lost to a
crash restarts from zero.  The rebuild periodically serializes the frame
cursor, the live track table, and the detected events; `run_video` resumes
from the newest checkpoint when given the same path.

Serialization notes:
  * Timestamps are day-anchored (frame_timestamp adds to pd.Timestamp
    ("00:00:00.000") == TODAY-midnight, matching io_video.py:74-82), so a
    checkpoint stores only the TIME OF DAY and re-anchors it at load — a
    run resumed on a later calendar day must not mix two dates into the
    exported timeline.  Raw string timestamps (the NULL_TIMESTAMP marker)
    are tagged and restored verbatim.
  * Checkpoints carry a source fingerprint (name, total_frames, fps);
    load refuses to resume against a different video.
  * The atomic-write temp file appends ".tmp" to the FULL name so distinct
    checkpoint paths differing only in suffix cannot collide.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Tuple

from ..pipeline.tracking import Event, SegmentTracker, Track


def _ts_to_json(ts):
    """Timestamp -> JSON: None, ["raw", s] for plain strings (NULL
    markers), or ["tod", "HH:MM:SS.ffffff"] for day-anchored Timestamps."""
    if ts is None:
        return None
    if isinstance(ts, str):
        return ["raw", ts]
    return ["tod", str(ts - ts.normalize())]


def _ts_from_json(v):
    """Inverse of _ts_to_json; re-anchors time-of-day to today's midnight
    (frame_timestamp's anchor).  Tolerates the pre-tag plain-string format
    of older checkpoints."""
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, list):
        tag, s = v
        if tag == "raw":
            return s
        return (pd.Timestamp("00:00:00.000") + pd.Timedelta(s)).round(freq="us")
    try:  # legacy checkpoints stored str(timestamp)
        return pd.Timestamp(v)
    except (ValueError, TypeError):
        return v


def _events_to_json(events: List[Event]):
    return [
        {
            "first_centroid": list(e.first_centroid),
            "last_centroid": list(e.last_centroid),
            "frame_number": int(e.frame_number),
            "timestamp": _ts_to_json(e.timestamp),
        }
        for e in events
    ]


def _events_from_json(raw):
    return [
        Event(
            first_centroid=tuple(e["first_centroid"]),
            last_centroid=tuple(e["last_centroid"]),
            frame_number=e["frame_number"],
            timestamp=_ts_from_json(e["timestamp"]),
        )
        for e in raw
    ]


def source_fingerprint(source) -> dict:
    """Identity stamp checked at resume (video mixups are silent count
    corruption otherwise).  Deliberately excludes frame counts: resuming a
    --end-truncated run against the full video is a supported pattern."""
    return {
        "name": None if source.filepath is None else Path(source.filepath).name,
        "fps": float(source.fps),
    }


def _check_fingerprint(state: dict, expect: Optional[dict], path: Path) -> None:
    saved = state.get("source")
    if saved is None or expect is None:
        return  # legacy checkpoint or caller opted out
    if saved != expect:
        raise ValueError(
            f"{path} was written for source {saved}, but this run reads "
            f"{expect}; refusing to resume (delete the checkpoint or point "
            "it at a per-video path)"
        )


def _atomic_write_json(path: Path, state: dict) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # append to the FULL name: with_suffix('.tmp') would collide for
    # distinct checkpoints differing only in their final suffix
    tmp = path.parent / (path.name + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    tmp.replace(path)  # atomic


def save_checkpoint(
    path: Path,
    next_frame_number: int,
    frames_processed: int,
    tracker: SegmentTracker,
    source_info: Optional[dict] = None,
) -> None:
    state = {
        "next_frame_number": int(next_frame_number),
        "frames_processed": int(frames_processed),
        "source": source_info,
        "tracks": [
            {
                "centroid": list(t.centroid),
                "frame_number": int(t.frame_number),
                "timestamp": _ts_to_json(t.timestamp),
                "hist_len": int(t.hist_len),
                "hist_first": None if t.hist_first is None else list(t.hist_first),
            }
            for t in tracker.prev
        ],
        "events": _events_to_json(tracker.events),
    }
    _atomic_write_json(path, state)


def save_checkpoint_device(
    path: Path,
    next_frame_number: int,
    frames_processed: int,
    dev_state,                      # pipeline.tracking_jax.TrackState
    events: List[Event],
    source_info: Optional[dict] = None,
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
        "source": source_info,
        "dev_state": {
            k: np.asarray(v).tolist() for k, v in dev_state._asdict().items()
        },
        "events": _events_to_json(events),
    }
    _atomic_write_json(path, state)


def load_checkpoint_device(path: Path, source_info: Optional[dict] = None):
    """Returns (next_frame_number, frames_processed, TrackState, events)
    or None if no checkpoint exists.  Raises on a host-tracker checkpoint
    (resume with tracker_impl='host' instead) or a source mismatch."""
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
    _check_fingerprint(state, source_info, path)
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
    events = _events_from_json(state["events"])
    return state["next_frame_number"], state["frames_processed"], dev_state, events


def load_checkpoint(
    path: Path, tracker: SegmentTracker, source_info: Optional[dict] = None
) -> Optional[Tuple[int, int]]:
    """Restore tracker state in place; returns (next_frame_number,
    frames_processed) or None if no checkpoint exists."""
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
    _check_fingerprint(state, source_info, path)

    tracker.prev = [
        Track(
            centroid=tuple(t["centroid"]),
            frame_number=t["frame_number"],
            timestamp=_ts_from_json(t["timestamp"]),
            hist_len=t["hist_len"],
            hist_first=None if t["hist_first"] is None else tuple(t["hist_first"]),
        )
        for t in state["tracks"]
    ]
    tracker.events = _events_from_json(state["events"])
    return state["next_frame_number"], state["frames_processed"]
