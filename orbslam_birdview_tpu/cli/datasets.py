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


class StereoRectifier:
    """Stereo rectification with per-camera K/D/R/P, exactly the reference's
    EuRoC preprocessing (`stereo_euroc.cc:main` builds
    `cv::initUndistortRectifyMap` maps from `LEFT.*`/`RIGHT.*` YAML entries
    and remaps every image pair before tracking)."""

    def __init__(self, left_K, left_D, left_R, left_P,
                 right_K, right_D, right_R, right_P, width: int, height: int):
        size = (int(width), int(height))
        self._ml = cv2.initUndistortRectifyMap(
            np.asarray(left_K, np.float64).reshape(3, 3),
            np.asarray(left_D, np.float64).ravel(),
            np.asarray(left_R, np.float64).reshape(3, 3),
            np.asarray(left_P, np.float64).reshape(3, 4)[:3, :3],
            size, cv2.CV_32FC1)
        self._mr = cv2.initUndistortRectifyMap(
            np.asarray(right_K, np.float64).reshape(3, 3),
            np.asarray(right_D, np.float64).ravel(),
            np.asarray(right_R, np.float64).reshape(3, 3),
            np.asarray(right_P, np.float64).reshape(3, 4)[:3, :3],
            size, cv2.CV_32FC1)

    def __call__(self, left: np.ndarray, right: np.ndarray):
        return (cv2.remap(left, self._ml[0], self._ml[1], cv2.INTER_LINEAR),
                cv2.remap(right, self._mr[0], self._mr[1], cv2.INTER_LINEAR))


def parse_rectification(path: str) -> Optional[StereoRectifier]:
    """Parse `LEFT.*`/`RIGHT.*` rectification blocks from a YAML config.

    Accepts both the reference's `!!opencv-matrix` multi-line blocks
    (`Examples/Stereo/EuRoC.yaml:37-81`) and this repo's flat one-line
    `LEFT.K: [a, b, ...]` form; returns None if no blocks are present."""
    import re

    with open(path) as f:
        text = f.read()
    vals = {}
    # flat scalar form: LEFT.width: 752
    for m in re.finditer(r"^\s*((?:LEFT|RIGHT)\.\w+)\s*:\s*([-+0-9.eE]+)\s*$",
                         text, re.M):
        vals[m.group(1)] = float(m.group(2))
    # flat list form: LEFT.K: [a, b, ...]
    for m in re.finditer(r"^\s*((?:LEFT|RIGHT)\.\w+)\s*:\s*\[([^\]]*)\]",
                         text, re.M):
        vals[m.group(1)] = np.array(
            [float(x) for x in m.group(2).replace(",", " ").split()])
    # opencv-matrix form: LEFT.K: !!opencv-matrix ... data: [a, b, ...]
    for m in re.finditer(
            r"((?:LEFT|RIGHT)\.\w+)\s*:\s*!!opencv-matrix.*?data\s*:\s*\[([^\]]*)\]",
            text, re.S):
        vals[m.group(1)] = np.array(
            [float(x) for x in m.group(2).replace(",", " ").split()])
    need = [f"{side}.{k}" for side in ("LEFT", "RIGHT")
            for k in ("K", "D", "R", "P")]
    if not all(k in vals for k in need):
        return None
    return StereoRectifier(
        vals["LEFT.K"], vals["LEFT.D"], vals["LEFT.R"], vals["LEFT.P"],
        vals["RIGHT.K"], vals["RIGHT.D"], vals["RIGHT.R"], vals["RIGHT.P"],
        int(vals.get("LEFT.width", 752)), int(vals.get("LEFT.height", 480)))


def load_euroc(root: str, cam: str = "cam0", stereo: bool = False,
               rectifier: Optional[StereoRectifier] = None
               ) -> Iterator[FrameRecord]:
    data_dir = os.path.join(root, "mav0", cam, "data")
    right_dir = os.path.join(root, "mav0", "cam1", "data")
    entries = []
    with open(os.path.join(root, "mav0", cam, "data.csv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            ts_ns, name = line.strip().split(",")[:2]
            entries.append((int(ts_ns) * 1e-9, name))
    for ts, name in entries:
        img = _gray(os.path.join(data_dir, name))
        if not stereo:
            yield FrameRecord(ts, img)
            continue
        # EuRoC cam0/cam1 are hardware-synced: same filename both sides
        rpath = os.path.join(right_dir, name)
        if not os.path.exists(rpath):
            continue
        right = _gray(rpath)
        if rectifier is not None:
            img, right = rectifier(img, right)
        yield FrameRecord(ts, img, right=right)


def load_fisheye_birdview(root: str, crop=(1900, 800), scale: float = 0.5,
                          front_mask_path: Optional[str] = None
                          ) -> Iterator[FrameRecord]:
    """The fork's driver format, byte-accurate to `mono_fisheye.cc`:

    - `associate.txt` lines are `timestamp x y theta image_name` (FIVE
      whitespace fields, `LoadDataset` at `mono_fisheye.cc:171-200`); the
      three per-frame files are derived as `image/<name>`,
      `birdview/<name>`, `mask/<name>` — the name appears ONCE per line.
    - the front image is zeroed wherever a GLOBAL front mask's green
      channel exceeds 250 (`applyMask`, `:205-212`; the driver loads
      `mask_new_front.png` once at `:56`), then cropped from the ORIGIN
      to 1900x800 (`cv::Rect(0,0,1900,800)`, `:110-114`) and downscaled
      0.5x (`:116`).
    - the per-frame birdview mask is binarized on its GREEN channel:
      <20 -> masked out (`ConvertMaskBirdview`, `:244-260`); the vehicle
      footprint rectangle is carved by the Frame builder downstream.
    """
    if front_mask_path is None:
        cand = os.path.join(root, "mask_new_front.png")
        front_mask_path = cand if os.path.exists(cand) else None
    fmask = None
    if front_mask_path is not None:
        fm = cv2.imread(front_mask_path, cv2.IMREAD_COLOR)
        if fm is not None:
            fmask = fm[:, :, 1] > 250   # green channel, BGR order
    with open(os.path.join(root, "associate.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            ts, x, y, th = (float(p) for p in parts[:4])
            name = parts[4]
            img = _gray(os.path.join(root, "image", name))
            bird = _gray(os.path.join(root, "birdview", name))
            mask = cv2.imread(os.path.join(root, "mask", name),
                              cv2.IMREAD_COLOR)
            if fmask is not None and fmask.shape == img.shape:
                img = np.where(fmask, 0.0, img)
            h, w = img.shape
            cw, ch = crop
            if w >= cw and h >= ch:
                img = img[:ch, :cw]   # origin crop, not centered
            if scale != 1.0:
                img = cv2.resize(img, None, fx=scale, fy=scale)
            bmask = ((mask[:, :, 1] >= 20).astype(np.float32)
                     if mask is not None else None)
            yield FrameRecord(ts, img, bird=bird, bird_mask=bmask,
                              odom_pose=np.array([x, y, th]))
