"""Console entry point: swiftwatcher-tpu.

Reference parity for __main__.py:13-53: per video, open a frame source by
suffix, resolve chimney corners (attributes.json or interactive picker),
run the counting pipeline, and export PREDICTED/REJECTED CSVs next to the
video (under --debug, into a versioned run directory).
"""

from __future__ import annotations

import os
import sys

from . import ui
from .config import config_with_overrides
from .io.readers import open_source
from .pipeline.runner import run_video


def main(argv=None) -> int:
    # Persistent XLA compilation cache: the window program recompiles only
    # per chimney geometry; caching makes repeat runs start in seconds, not
    # minutes.  Configured HERE, not at import — importing this module must
    # not mutate global jax config (the test suite imports it, and its CPU
    # programs must not be written into the production cache).
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SWTPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/swiftwatcher_tpu_xla"),
        ),
    )
    args = ui.parse_args(argv)
    overrides = list(args.set)
    if args.accuracy_pack:
        from .config import ACCURACY_PACK_OVERRIDES

        # preset first: an explicit --set of the same field wins (later
        # overrides replace earlier ones in config_with_overrides)
        overrides = list(ACCURACY_PACK_OVERRIDES) + overrides
    cfg = config_with_overrides(overrides)
    filepaths = args.filepaths if args.filepaths else ui.select_filepaths()

    mesh = None
    if args.mesh:
        import re

        import jax

        from .parallel.mesh import make_mesh

        m = re.fullmatch(r"(\d+)(?:x(\d+))?", args.mesh)
        if not m:
            print(
                f"[!] --mesh must look like DATAxMODEL (e.g. 4x2), "
                f"got {args.mesh!r}.", file=sys.stderr,
            )
            return 2
        shape = (int(m.group(1)), int(m.group(2) or 1))
        have = len(jax.devices())
        if shape[0] * shape[1] > have:
            print(
                f"[!] --mesh {args.mesh} needs {shape[0] * shape[1]} "
                f"devices; only {have} available.", file=sys.stderr,
            )
            return 2
        mesh = make_mesh(shape=shape)

    segment_filter = None
    if args.classify:
        from .models.classifier import SqueezeNetSegmentFilter

        segment_filter = SqueezeNetSegmentFilter.from_default_weights(cfg)

    jobs, out_dirs = [], []
    for src_path in filepaths:
        source = open_source(src_path, start=args.start, end=args.end if args.end > 0 else 0)
        output_dir = src_path.parent / src_path.stem
        attrs = output_dir / "attributes.json"
        if attrs.is_file():
            corners = ui.get_corners_from_file(attrs)
        else:
            corners = ui.select_chimney_corners(src_path)
        jobs.append((source, corners))
        out_dirs.append(output_dir)

    def kwargs_for(i):
        return dict(
            export_dir=out_dirs[i],
            debug=args.debug,
            segment_filter=segment_filter,
            status_cb=ui.frames_processed_status if args.parallel_videos == 1 else None,
            # The reference writes under <video file path>/segments
            # (__main__.py:95-96), which treats the video FILE as a directory
            # and cannot be created on any filesystem — a latent crash.  We
            # use the sibling output directory instead.
            export_segments_dir=(out_dirs[i] / "segments") if args.export else None,
            tracker_impl=args.tracker,
            profile_dir=(out_dirs[i] / "profile") if args.profile else None,
            mesh=mesh,
        )

    if args.parallel_videos > 1:
        from .pipeline.multi import run_videos

        results = run_videos(
            jobs,
            cfg,
            max_concurrent=args.parallel_videos,
            per_video_kwargs=kwargs_for,
        )
    else:
        results = []
        for i, (source, corners) in enumerate(jobs):
            ui.start_status(filepaths[i].name)
            results.append(run_video(source, corners, cfg, **kwargs_for(i)))

    for src_path, result in zip(filepaths, results):
        if result.df_labels is None:
            print("[!] No events detected in video '{}'.".format(src_path.stem))
        else:
            print(
                "[-]     {}: {} predicted / {} rejected swifts.".format(
                    src_path.stem, result.total_predicted, result.total_rejected
                )
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
