"""Dataset loaders for the standard SLAM benchmarks.

Re-implements the reference's example-driver loaders
(`/root/reference/Examples/`):
- TUM RGB-D: `rgb.txt` / `depth.txt` (+ `associations.txt` pairing,
  `rgbd_tum.cc:LoadImages`), mono uses rgb.txt only (`mono_tum.cc`).
- KITTI odometry: `image_0/%06d.png` + `times.txt`
  (`mono_kitti.cc:LoadImages`, `stereo_kitti.cc` adds `image_1/`).
- EuRoC: `mav0/cam0/data/` + timestamp file (`mono_euroc.cc`).
- Fisheye-birdview: `associate.txt` with timestamp, 2D odom pose, and
  image/birdview/mask triplets (`mono_fisheye.cc:171-200`).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import cv2
import numpy as np


@dataclass
class FrameRecord:
    timestamp: float
    img: np.ndarray
    depth: Optional[np.ndarray] = None
    right: Optional[np.ndarray] = None
    bird: Optional[np.ndarray] = None
    bird_mask: Optional[np.ndarray] = None
    odom_pose: Optional[np.ndarray] = None  # (x, y, theta) if present


def _gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def load_tum_mono(root: str) -> Iterator[FrameRecord]:
    with open(os.path.join(root, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            yield FrameRecord(float(ts), _gray(os.path.join(root, rel)))


def load_tum_rgbd(root: str, depth_factor: float = 5000.0,
                  max_dt: float = 0.02) -> Iterator[FrameRecord]:
    """Associates rgb.txt and depth.txt by nearest timestamp (the reference
    expects a pre-built associations.txt; we do the association inline)."""
    def read_list(name):
        out = []
        with open(os.path.join(root, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                out.append((float(ts), rel))
        return out

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    d_ts = np.array([t for t, _ in depth])
    for ts, rel in rgb:
        j = int(np.argmin(np.abs(d_ts - ts)))
        if abs(d_ts[j] - ts) > max_dt:
            continue
        img = _gray(os.path.join(root, rel))
        d = cv2.imread(os.path.join(root, depth[j][1]), cv2.IMREAD_UNCHANGED)
        if d is None:
            continue
        yield FrameRecord(ts, img, depth=d.astype(np.float32) / depth_factor)


def load_kitti(root: str, stereo: bool = False) -> Iterator[FrameRecord]:
    with open(os.path.join(root, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    for i, ts in enumerate(times):
        left = _gray(os.path.join(root, "image_0", f"{i:06d}.png"))
        right = (_gray(os.path.join(root, "image_1", f"{i:06d}.png"))
                 if stereo else None)
        yield FrameRecord(ts, left, right=right)


def load_euroc(root: str, cam: str = "cam0") -> Iterator[FrameRecord]:
    data_dir = os.path.join(root, "mav0", cam, "data")
    entries = []
    with open(os.path.join(root, "mav0", cam, "data.csv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            ts_ns, name = line.strip().split(",")[:2]
            entries.append((int(ts_ns) * 1e-9, name))
    for ts, name in entries:
        yield FrameRecord(ts, _gray(os.path.join(data_dir, name)))


def load_fisheye_birdview(root: str, crop=(1900, 800), scale: float = 0.5
                          ) -> Iterator[FrameRecord]:
    """The fork's driver format (`mono_fisheye.cc:171-200`): associate.txt
    lines `timestamp x y theta front_img bird_img mask_img`; front image is
    masked/cropped/downscaled (`:102-116`), BEV mask binarized."""
    with open(os.path.join(root, "associate.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 7:
                continue
            ts, x, y, th = (float(p) for p in parts[:4])
            img = _gray(os.path.join(root, parts[4]))
            bird = _gray(os.path.join(root, parts[5]))
            mask = cv2.imread(os.path.join(root, parts[6]),
                              cv2.IMREAD_GRAYSCALE)
            h, w = img.shape
            cw, ch = crop
            if w > cw and h > ch:
                x0 = (w - cw) // 2
                img = img[:ch, x0 : x0 + cw]
            if scale != 1.0:
                img = cv2.resize(img, None, fx=scale, fy=scale)
            bmask = (mask > 127).astype(np.float32) if mask is not None else None
            yield FrameRecord(ts, img, bird=bird, bird_mask=bmask,
                              odom_pose=np.array([x, y, th]))
