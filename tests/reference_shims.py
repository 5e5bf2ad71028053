"""Import the ACTUAL reference package (/root/reference/swiftwatcher) for
differential testing against this rebuild.

The reference needs two third-party packages absent from this environment,
so minimal exact shims are installed into sys.modules first:

- ``skimage.measure.regionprops`` — the reference consumes only ``label``,
  ``bbox`` and ``centroid`` of each region (data_structures.py:21-30 copies
  every public attribute onto Segment, but only those three are ever read:
  segment_tracking.py:193-220 uses centroid, image_filtering.py:338-341
  uses bbox, segment_classification.py:42 rebinds label).  All three are
  exact integer/float arithmetic over the component's pixel coordinates,
  reproduced here with numpy (ascending-label order, matching skimage).
- ``torchvision`` — ``models.squeezenet1_0`` (the public torchvision 1.0
  architecture; every parameter is immediately overwritten by
  ``load_state_dict(model.pt)``, so pretrained weights are irrelevant) and
  the five ``transforms`` used by segment_classification.py:18-24,
  re-implemented on PIL + torch with torchvision's documented semantics.

This makes the rebuild's test oracle itself testable: oracle_pipeline.py
re-states reference semantics from reading the source; the differential
test runs the reference's real FrameQueue/tracker/classifier code on the
same frames and asserts the outputs agree.
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# skimage shim
# --------------------------------------------------------------------------
class _Region:
    """Exact regionprops subset: label / bbox / centroid / area / coords."""

    def __init__(self, label, ys, xs):
        self.label = int(label)
        self.bbox = (int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1)
        self.centroid = (float(ys.mean()), float(xs.mean()))
        self.area = int(ys.size)
        self.coords = np.stack([ys, xs], axis=1)


def _regionprops(label_image, coordinates=None):
    """skimage.measure.regionprops over an integer label image: one region
    per positive label value, ascending by label (skimage's order)."""
    regions = []
    for k in np.unique(label_image):
        if k == 0:
            continue
        ys, xs = np.nonzero(label_image == k)
        regions.append(_Region(k, ys, xs))
    return regions


def _install_skimage():
    if "skimage" in sys.modules:
        return
    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.regionprops = _regionprops
    skimage.measure = measure
    sys.modules["skimage"] = skimage
    sys.modules["skimage.measure"] = measure


# --------------------------------------------------------------------------
# torchvision shim
# --------------------------------------------------------------------------
def _build_torchvision():
    import torch
    from torch import nn
    from PIL import Image, ImageOps

    class Fire(nn.Module):
        def __init__(self, cin, sq, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, sq, kernel_size=1)
            self.squeeze_activation = nn.ReLU(inplace=True)
            self.expand1x1 = nn.Conv2d(sq, e1, kernel_size=1)
            self.expand1x1_activation = nn.ReLU(inplace=True)
            self.expand3x3 = nn.Conv2d(sq, e3, kernel_size=3, padding=1)
            self.expand3x3_activation = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat(
                [
                    self.expand1x1_activation(self.expand1x1(x)),
                    self.expand3x3_activation(self.expand3x3(x)),
                ],
                1,
            )

    class SqueezeNet(nn.Module):
        """torchvision squeezenet1_0 module layout (state_dict-key exact:
        features.{0,3,4,5,7,8,9,10,12}, classifier.1)."""

        def __init__(self, num_classes=1000):
            super().__init__()
            self.num_classes = num_classes
            self.features = nn.Sequential(
                nn.Conv2d(3, 96, kernel_size=7, stride=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                Fire(96, 16, 64, 64),
                Fire(128, 16, 64, 64),
                Fire(128, 32, 128, 128),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                Fire(256, 32, 128, 128),
                Fire(256, 48, 192, 192),
                Fire(384, 48, 192, 192),
                Fire(384, 64, 256, 256),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                Fire(512, 64, 256, 256),
            )
            final_conv = nn.Conv2d(512, num_classes, kernel_size=1)
            self.classifier = nn.Sequential(
                nn.Dropout(p=0.5),
                final_conv,
                nn.ReLU(inplace=True),
                nn.AdaptiveAvgPool2d((1, 1)),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.classifier(x)
            return torch.flatten(x, 1)

    def squeezenet1_0(pretrained=False, **kwargs):
        # pretrained weights intentionally not loaded: the reference
        # overwrites every parameter via load_state_dict(model.pt)
        # immediately after construction (segment_classification.py:16-17).
        return SqueezeNet(**kwargs)

    class ToPILImage:
        def __call__(self, x):
            return Image.fromarray(np.ascontiguousarray(x))

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            h, w = self.size if isinstance(self.size, (tuple, list)) else (
                self.size,
                self.size,
            )
            return img.resize((w, h), self.interpolation)

    class Pad:
        def __init__(self, padding, fill=0):
            self.padding = padding
            self.fill = fill

        def __call__(self, img):
            return ImageOps.expand(img, border=self.padding, fill=self.fill)

    class ToTensor:
        def __call__(self, img):
            a = np.array(img, dtype=np.uint8)
            t = torch.from_numpy(a).permute(2, 0, 1).contiguous()
            return t.to(torch.float32).div(255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    torchvision = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")
    models.squeezenet1_0 = squeezenet1_0
    transforms.ToPILImage = ToPILImage
    transforms.Resize = Resize
    transforms.Pad = Pad
    transforms.ToTensor = ToTensor
    transforms.Normalize = Normalize
    torchvision.models = models
    torchvision.transforms = transforms
    return torchvision, models, transforms


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    torchvision, models, transforms = _build_torchvision()
    sys.modules["torchvision"] = torchvision
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms


# --------------------------------------------------------------------------
# reference import
# --------------------------------------------------------------------------
def import_reference():
    """Install the shims and import the reference package; returns the
    module namespace (io_video, data_structures, image_filtering,
    segment_tracking, segment_classification, event_classification,
    main as the __main__ module)."""
    _install_skimage()
    _install_torchvision()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    ns = types.SimpleNamespace()
    ns.io_video = importlib.import_module("swiftwatcher.io_video")
    ns.data_structures = importlib.import_module("swiftwatcher.data_structures")
    ns.image_filtering = importlib.import_module("swiftwatcher.image_filtering")
    ns.segment_tracking = importlib.import_module("swiftwatcher.segment_tracking")
    ns.segment_classification = importlib.import_module(
        "swiftwatcher.segment_classification"
    )
    ns.event_classification = importlib.import_module(
        "swiftwatcher.event_classification"
    )
    ns.io_data = importlib.import_module("swiftwatcher.io_data")
    ns.main = importlib.import_module("swiftwatcher.__main__")
    return ns
