#!/usr/bin/env python
"""Convert a torch SqueezeNet state_dict (the reference's model.pt) into the
framework's .npz weight format.

Usage:
    python tools/convert_model.py <model.pt> <out.npz>
    python tools/convert_model.py            # default: reference model.pt ->
                                             # swiftwatcher_tpu/models/segment_classifier.npz

The .pt file is a torch-pickled state_dict of torchvision squeezenet1_0 with
a 2-class classifier conv (segment_classification.py:47-67); conversion
transposes conv kernels OIHW -> HWIO for NHWC inference on TPU.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from swiftwatcher_tpu.models.squeezenet import convert_torch_state_dict  # noqa: E402


def main(argv):
    src = Path(argv[1]) if len(argv) > 1 else Path("/root/reference/swiftwatcher/model.pt")
    dst = (
        Path(argv[2])
        if len(argv) > 2
        else REPO / "swiftwatcher_tpu" / "models" / "segment_classifier.npz"
    )
    import torch

    state = torch.load(str(src), map_location="cpu", weights_only=True)
    params = convert_torch_state_dict({k: v.numpy() for k, v in state.items()})
    np.savez(dst, **params)
    print(f"wrote {dst} ({len(params)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
