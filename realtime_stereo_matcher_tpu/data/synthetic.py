"""Procedural synthetic stereo dataset with exact ground-truth disparity.

No datasets are mounted in this environment, so training-convergence
evidence (VERDICT round 1, item 2) uses procedurally generated scenes:

* the *right* image is a multi-octave value-noise texture (3 channels);
* the left-view disparity map is a slanted background plane plus several
  soft-edged elliptical "objects", each on its own (closer) slanted plane,
  composited with max() -- piecewise-smooth with depth discontinuities,
  like real stereo;
* the *left* image is the right image bilinearly sampled at ``x - d(x, y)``
  (rectified-stereo geometry: a point at x_L in the left view appears at
  x_L - d in the right view), so d is exact by construction;
* columns where ``x - d < 0`` fall outside the right view -> valid=0 there
  (plus a small texture-border margin).

Deterministic per (seed, index): item i of a dataset is always the same
scene, so train/holdout splits are just disjoint seed ranges.  Samples
follow the repo-wide contract of data/datasets.py: flow = -disparity
(negative-flow convention), NHWC float32.
"""

from __future__ import annotations

import functools

import numpy as np

try:  # cv2's resize/remap run in C and release the GIL -- ~10x the numpy
    import cv2

    cv2.setNumThreads(0)  # single-threaded per loader worker, like augment.py
except ImportError:  # pragma: no cover - cv2 is in the image
    cv2 = None

from realtime_stereo_matcher_tpu.data.datasets import StereoDataset


@functools.lru_cache(maxsize=8)
def _grids(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy.setflags(write=False)
    xx.setflags(write=False)
    return yy, xx


def _value_noise(rng, h, w, octaves=((8, 1.0), (24, 0.6), (64, 0.35)),
                 channels=3):
    """Sum of bilinearly-upsampled random grids, normalized to [0, 255]."""
    out = np.zeros((h, w, channels), np.float32)
    for cells, amp in octaves:
        gh, gw = max(2, int(cells * h / max(h, w))), max(2, cells)
        grid = rng.standard_normal((gh, gw, channels)).astype(np.float32)
        if cv2 is not None:
            g = cv2.resize(grid, (w, h), interpolation=cv2.INTER_LINEAR)
        else:
            ys = np.linspace(0, gh - 1, h, dtype=np.float32)
            xs = np.linspace(0, gw - 1, w, dtype=np.float32)
            y0 = np.clip(ys.astype(np.int32), 0, gh - 2)
            x0 = np.clip(xs.astype(np.int32), 0, gw - 2)
            fy = (ys - y0)[:, None, None]
            fx = (xs - x0)[None, :, None]
            g = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
                 + grid[y0][:, x0 + 1] * (1 - fy) * fx
                 + grid[y0 + 1][:, x0] * fy * (1 - fx)
                 + grid[y0 + 1][:, x0 + 1] * fy * fx)
        out += amp * g
    out -= out.min()
    out *= 255.0 / max(out.max(), 1e-6)
    return out


def _plane(rng, h, w, lo, hi, max_slope=0.03):
    """Slanted plane d(x, y) = a + b*x + c*y with range clipped to [lo, hi]."""
    a = rng.uniform(lo, hi)
    b = rng.uniform(-max_slope, max_slope)
    c = rng.uniform(-max_slope, max_slope)
    yy, xx = _grids(h, w)
    return np.clip(a + b * (xx - w / 2) + c * (yy - h / 2), lo, hi)


def make_scene(seed: int, h: int = 320, w: int = 448, max_disp: float = 64.0,
               n_objects: int = 5):
    """One synthetic stereo pair.

    Returns (left, right, disp, valid): uint8 images (H, W, 3), float32
    left-view disparity (H, W), float32 validity (H, W).
    """
    rng = np.random.default_rng(seed)
    margin = int(max_disp) + 4
    right_wide = _value_noise(rng, h, w + margin)  # extra left context

    # disparity: background plane + closer elliptical objects (painter max)
    disp = _plane(rng, h, w, 0.05 * max_disp, 0.35 * max_disp)
    yy, xx = _grids(h, w)
    for _ in range(int(rng.integers(max(1, n_objects - 2), n_objects + 1))):
        cx = rng.uniform(0.15 * w, 0.85 * w)
        cy = rng.uniform(0.15 * h, 0.85 * h)
        rx = rng.uniform(0.06, 0.22) * w
        ry = rng.uniform(0.08, 0.3) * h
        ang = rng.uniform(0, np.pi)
        dx, dy = xx - cx, yy - cy
        u = dx * np.cos(ang) + dy * np.sin(ang)
        v = -dx * np.sin(ang) + dy * np.cos(ang)
        r2 = (u / rx) ** 2 + (v / ry) ** 2
        inside = r2 < 1.0
        obj = _plane(rng, h, w, 0.4 * max_disp, 0.9 * max_disp)
        disp = np.where(inside, np.maximum(disp, obj), disp)
    disp = disp.astype(np.float32)

    # left(x) = right_wide(margin + x - d) -- bilinear in x
    src = margin + xx - disp
    if cv2 is not None:
        map_y = np.ascontiguousarray(yy)
        left = cv2.remap(right_wide, np.ascontiguousarray(src), map_y,
                         interpolation=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REPLICATE)
    else:
        x0 = np.floor(src).astype(np.int32)
        fx = (src - x0)[..., None]
        x0c = np.clip(x0, 0, w + margin - 2)
        rows = np.arange(h)[:, None]
        left = (right_wide[rows, x0c] * (1 - fx)
                + right_wide[rows, x0c + 1] * fx)

    valid = (src >= 0) & (src <= w + margin - 1)
    right = right_wide[:, margin:]
    return (left.astype(np.uint8), right.astype(np.uint8), disp,
            valid.astype(np.float32))


class SyntheticStereo(StereoDataset):
    """Map-style procedural dataset (contract of data/datasets.py).

    ``seed0`` partitions scenes: disjoint ranges give disjoint train/holdout
    sets.  Supports the standard dense FlowAugmentor via ``aug_params``.
    """

    def __init__(self, aug_params=None, *, length: int = 2000,
                 seed0: int = 0, image_hw=(320, 448), max_disp: float = 64.0,
                 cache: bool = True):
        super().__init__(aug_params)
        self.length = int(length)
        self.seed0 = int(seed0)
        self.image_hw = tuple(image_hw)
        self.max_disp = float(max_disp)
        # scenes are deterministic per (seed, index) -> memoize raw scenes
        # (~2 MB each; generation costs ~21 ms/scene on this host).  Plain
        # dict writes are atomic under the GIL; a rare duplicate regeneration
        # by racing loader threads is benign (same deterministic value).
        self._cache: dict | None = {} if cache else None
        # base-class bookkeeping so __mul__/ConcatDataset len() work
        self.image_list = [[f"synthetic://{seed0 + i}/left",
                            f"synthetic://{seed0 + i}/right"]
                           for i in range(self.length)]
        self.disparity_list = [f"synthetic://{seed0 + i}/disp"
                               for i in range(self.length)]
        self.extra_info = [[f"synthetic://{seed0 + i}"]
                           for i in range(self.length)]

    def _get(self, index, rng):
        index = index % self.length
        if self._cache is not None and index in self._cache:
            img1, img2, disp, valid = self._cache[index]
        else:
            img1, img2, disp, valid = make_scene(
                self.seed0 + index, *self.image_hw, max_disp=self.max_disp)
            if self._cache is not None:
                self._cache[index] = (img1, img2, disp, valid)
        flow = np.stack([-disp, np.zeros_like(disp)], axis=-1)

        if self.augmentor is not None:
            # augmentor operates on uint8 images (like the file datasets);
            # crop/flip invalidate the geometric mask -> recompute like the
            # dense base path (datasets.py _get)
            img1, img2, flow = self.augmentor(img1, img2, flow, rng=rng)
            valid = ((np.abs(flow[..., 0]) < 512)
                     & (np.abs(flow[..., 1]) < 512)).astype(np.float32)

        flow = flow[..., :1].astype(np.float32)
        return (self.image_list[index] + [self.disparity_list[index]],
                img1.astype(self.out_dtype), img2.astype(self.out_dtype), flow,
                np.asarray(valid, np.float32))
