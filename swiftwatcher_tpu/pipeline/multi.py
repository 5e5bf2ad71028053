"""Multi-video execution.

The reference processes videos strictly sequentially (__main__.py:21); the
natural scale-out axis is across videos (SURVEY.md §2.3).  Each video keeps
its own prefetcher/tracker/compiled-program family (crop geometry differs
per chimney), and jobs run on worker threads: while one video's windows are
uploading or computing on device, another's host tracking and CSV export
proceed — the device dispatch queue interleaves them safely.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence, Tuple

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..io.readers import FrameSource
from .runner import VideoResult, run_video


def run_videos(
    jobs: Sequence[Tuple[FrameSource, Sequence[Tuple[int, int]]]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_concurrent: int = 2,
    **run_kwargs,
) -> List[VideoResult]:
    """Run (source, corners) jobs concurrently; results in job order.

    run_kwargs are forwarded to run_video.  Callables in run_kwargs (e.g.
    segment_filter) are shared across jobs and must be thread-safe; per-video
    paths (export_dir, checkpoint_path) should be passed as callables taking
    the job index via `per_video_kwargs` instead.
    """
    per_video = run_kwargs.pop("per_video_kwargs", None)
    with ThreadPoolExecutor(max_workers=max(1, max_concurrent)) as ex:
        futures = []
        for i, (source, corners) in enumerate(jobs):
            kw = dict(run_kwargs)
            if per_video is not None:
                kw.update(per_video(i))
            futures.append(ex.submit(run_video, source, corners, cfg, **kw))
        return [f.result() for f in futures]
