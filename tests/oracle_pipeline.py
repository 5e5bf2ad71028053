"""Full reference-semantics pipeline oracle (test-only).

Re-states the reference's end-to-end behavior (/root/reference/swiftwatcher,
see SURVEY.md §3 call stacks) in compact NumPy/cv2/scipy form, using the
same native libraries the reference calls, float64 throughout:

  window loop (__main__.py:71-98) -> crop/gray (data_structures.py:171-185)
  -> IALM RPCA f64 (image_filtering.py:220-301, svp quirk)
  -> cv2.bilateralFilter(7,15,1) / THRESH_TOZERO(15) / grey_opening(3,3)
  -> cv2.connectedComponents (effective 8-conn) -> uint8 label cast
  -> regionprops moments -> Hungarian tracking (segment_tracking.py)
  -> ROI disappearance events -> angle classification
  (event_classification.py).

skimage is unavailable in this environment; regionprops' centroid/label
ordering is reproduced with NumPy directly (ascending label value).
"""

import math
import sys

import cv2
import numpy as np
from scipy import ndimage
from scipy.optimize import linear_sum_assignment

from oracles import ialm_rpca_f64

EPS = sys.float_info.epsilon


def _regions_of(labels_u8):
    """(label, centroid_y, centroid_x) ascending by label value, regionprops
    style over a uint8 (possibly aliased) label image."""
    out = []
    for k in np.unique(labels_u8):
        if k == 0:
            continue
        ys, xs = np.nonzero(labels_u8 == k)
        out.append((int(k), ys.mean(), xs.mean()))
    return out


def _localize_window(gray_frames):
    """21-frame localization: RPCA -> filters -> CCL -> centroids/frame."""
    T = len(gray_frames)
    H, W = gray_frames[0].shape
    X = np.stack(gray_frames).reshape(T, H * W).T.astype(np.float64)
    _, E, _ = ialm_rpca_f64(X)
    motion = np.clip(-E, 0, 255).astype(np.uint8).T.reshape(T, H, W)
    per_frame = []
    for t in range(T):
        f = cv2.bilateralFilter(motion[t], 7, 15, 1).astype(np.uint8)
        _, f = cv2.threshold(f, 15, 255, cv2.THRESH_TOZERO)
        f = ndimage.grey_opening(f.astype(np.uint8), size=(3, 3)).astype(np.uint8)
        _, lbl = cv2.connectedComponents(f)  # effective 8-connectivity
        lbl = lbl.astype(np.uint8)
        per_frame.append(_regions_of(lbl))
    return per_frame


class _OracleTracker:
    """Reference SegmentTracker with full history lists."""

    def __init__(self, roi_mask):
        self.roi = roi_mask
        self.prev = []  # list of dicts
        self.events = []  # list of history lists

    def step(self, centroids, frame_number, timestamp):
        curr = [
            {"c": (cy, cx), "fn": frame_number, "ts": timestamp, "hist": [], "status": None}
            for _, cy, cx in centroids
        ]
        n_prev, n_curr = len(self.prev), len(curr)
        n = n_prev + n_curr
        cost = np.ones((n, n)) + EPS
        for i, p in enumerate(self.prev):
            for j, c in enumerate(curr):
                d = math.dist(p["c"], c["c"])
                try:
                    d_cost = 2.0 ** (d - 25)
                except OverflowError:
                    d_cost = math.inf
                if len(p["hist"]) > 0:
                    iy, ix = p["hist"][0]["c"]
                    py, px = p["c"]
                    cy, cx = c["c"]
                    old = math.degrees(math.atan2(iy - py, -(ix - px)))
                    new = math.degrees(math.atan2(py - cy, -(px - cx)))
                    ad = abs(new - old)
                    ad = min(ad, 360 - ad)
                    a_cost = 2.0 ** (ad - 90)
                else:
                    a_cost = 1.0
                cost[i, j + n_prev] = 0.5 * d_cost + 0.5 * a_cost
        np.fill_diagonal(cost, 1.0)
        if n > 0:
            _, assign = linear_sum_assignment(cost)
            for i in range(n_prev):
                j = int(assign[i]) - n_prev
                if j >= 0:
                    self.prev[i]["status"] = j
                    curr[j]["status"] = i
                else:
                    self.prev[i]["status"] = "D"
            for j in range(n_curr):
                if int(assign[n_prev + j]) - n_prev == j:
                    curr[j]["status"] = "A"
        for j, c in enumerate(curr):
            if c["status"] != "A" and c["status"] is not None:
                matched = self.prev[c["status"]]
                hist = matched["hist"]
                hist.append(matched)
                c["hist"] = hist
        for p in self.prev:
            if p["status"] == "D":
                y, x = int(p["c"][0]), int(p["c"][1])
                if self.roi[y, x] != 255:
                    continue
                if len(p["hist"]) < 1:
                    continue
                path = p["hist"]
                path.append(p)
                self.events.append(list(path))
        self.prev = curr


def _roi_mask(frame, corners):
    """generate_roi_mask oracle (image_filtering.py:99-122) via cv2."""
    left = min(corners[0][0], corners[1][0])
    right = max(corners[0][0], corners[1][0])
    bottom = max(corners[0][1], corners[1][1])
    w = right - left
    crop = [(left - int(0.125 * w), bottom - int(0.5 * w)),
            (right + int(0.125 * w), bottom + int(0.125 * w))]
    roi = [(int(left + 0.025 * w), int(bottom - 0.25 * w)),
           (int(right - 0.025 * w), int(bottom))]
    strip = frame[roi[0][1]:roi[1][1], roi[0][0]:roi[1][0]]
    blurred = cv2.medianBlur(cv2.medianBlur(strip, 9), 9)
    b = cv2.split(blurred)[0]
    _, th = cv2.threshold(b, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    edge = cv2.Canny(th, 0, 256)
    dil = cv2.dilate(edge, kernel=np.ones((20, 1), np.uint8), anchor=(0, 0))
    canvas = np.zeros(frame.shape[:2], np.uint8)
    canvas[roi[0][1]:roi[1][1], roi[0][0]:roi[1][0]] = dil
    cropped = canvas[crop[0][1]:crop[1][1], crop[0][0]:crop[1][0]]
    _, mask = cv2.threshold(cropped, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    return crop, mask


def reference_pipeline(frames, corners, fps=30.0, window=21):
    """Run the full oracle; returns (events, labels) where events are
    (first_c, last_c, last_fn) and labels the classification 0/1 list."""
    crop_region, roi_mask = _roi_mask(frames[0], corners)
    (x1, y1), (x2, y2) = crop_region
    tracker = _OracleTracker(roi_mask)

    total = len(frames)
    processed = 0
    next_fn = 0
    last_good = None
    while processed < total:
        nums, grays = [], []
        for _ in range(window):
            fn = next_fn
            next_fn += 1
            if 0 <= fn <= total:  # inclusive end quirk (io_video.py:40)
                if fn < total:
                    img = frames[fn]
                    last_good = img
                else:
                    img = last_good  # decode-failure substitution
                nums.append(fn)
            else:
                img = np.zeros_like(frames[0])
                nums.append(-1)
            crop = img[y1:y2, x1:x2]
            grays.append(cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY))
        per_frame = _localize_window(grays)
        for t in range(window):
            tracker.step(per_frame[t], nums[t], None)
            if nums[t] >= 0:
                processed += 1

    events = [
        (e[0]["c"], e[-1]["c"], e[-1]["fn"]) for e in tracker.events
    ]
    # classification (event_classification.py:47-141)
    angles = []
    for first, last, _ in events:
        dy = first[0] - last[0]
        dx = -(first[1] - last[1])
        angles.append(math.degrees(math.atan2(dy, dx)))
    kept = [(a, ev) for a, ev in zip(angles, events) if a % 15 != 0]
    if not kept:
        # all angles filtered: the reference's filter_false_angles drops
        # every row, leaving an empty labels dataframe — return the same
        # (kept-events, labels) shape as the normal branch, i.e. nothing
        return [], []
    ks = np.array([a for a, _ in kept])
    hist, edges = np.histogram(ks, bins=36, range=[-180 - EPS, 180 + EPS])
    i_max = int(np.argmax(hist))
    xl = edges[i_max]
    if -135 < xl < -45:
        f0, f_1, f1 = hist[i_max], hist[i_max - 1], hist[i_max + 1]
        w = abs(edges[1] - edges[0])
        mode = xl + ((f0 - f_1) / (2 * f0 - f1 - f_1)) * w
    else:
        mode = -90
    labels = [1 if (mode - 30) < a <= (mode + 30) else 0 for a in ks]
    return [ev for _, ev in kept], labels
