"""Headless visualization: map / trajectory / frame overlays.

Capability-equivalent of the reference's Pangolin viewer stack
(`src/Viewer.cc`, `src/FrameDrawer.cc`, `src/MapDrawer.cc`) for a headless
environment: renders to PNG files (or returns arrays) instead of a GL
window. Covers: current-frame keypoint/state overlay, map points +
keyframe frusta + covisibility graph, trajectory vs ground truth.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def draw_frame(img: np.ndarray, kp_xy: np.ndarray, kp_valid: np.ndarray,
               kp_tracked: Optional[np.ndarray] = None,
               state_text: str = "") -> np.ndarray:
    """FrameDrawer::DrawFrame — keypoints as circles (green=tracked landmark,
    blue=detected only), state banner. Returns an RGB uint8 image."""
    import cv2

    rgb = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                       cv2.COLOR_GRAY2BGR)
    for i in np.nonzero(np.asarray(kp_valid))[0]:
        x, y = int(kp_xy[i, 0]), int(kp_xy[i, 1])
        tracked = kp_tracked is not None and bool(kp_tracked[i])
        color = (0, 255, 0) if tracked else (255, 128, 0)
        cv2.circle(rgb, (x, y), 2, color, 1)
    if state_text:
        cv2.putText(rgb, state_text, (10, 20), cv2.FONT_HERSHEY_SIMPLEX,
                    0.55, (255, 255, 255), 1)
    return rgb


def plot_map(store, path: str, gt_centers: Optional[np.ndarray] = None,
             show_covis: bool = True):
    """MapDrawer equivalent: top-down map points, keyframe positions,
    covisibility edges, optional ground truth. Saves a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    ids = store.valid_mp_ids()
    if len(ids):
        P = store.mp_pos[ids]
        ax.scatter(P[:, 0], P[:, 2] if _z_forward(store) else P[:, 1],
                   s=1, c="#999999", label="map points")
    bids = store.valid_bmp_ids()
    if len(bids):
        B = store.bmp_pos[bids]
        ax.scatter(B[:, 0], B[:, 2] if _z_forward(store) else B[:, 1],
                   s=2, c="#2a9d2a", label="bird points")
    kfs = store.valid_kf_ids()
    centers = np.stack([store.kf_center(k) for k in kfs]) if len(kfs) else None
    if centers is not None:
        u = centers[:, 0]
        v = centers[:, 2] if _z_forward(store) else centers[:, 1]
        ax.plot(u, v, "b.-", ms=4, lw=0.8, label="keyframes")
        if show_covis:
            for a_i, a in enumerate(kfs):
                for b_i, b in enumerate(kfs):
                    if b <= a:
                        continue
                    if store.covis[a, b] >= 100:
                        ax.plot([u[a_i], u[b_i]], [v[a_i], v[b_i]],
                                "c-", lw=0.3, alpha=0.4)
    if gt_centers is not None:
        ax.plot(gt_centers[:, 0], gt_centers[:, 1], "r--", lw=0.8,
                label="ground truth")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def _z_forward(store) -> bool:
    """Heuristic plotting plane: if keyframes spread more in (x,z) than
    (x,y), plot x-z (camera-forward convention)."""
    kfs = store.valid_kf_ids()
    if len(kfs) < 2:
        return True
    C = np.stack([store.kf_center(k) for k in kfs])
    return C[:, 2].std() >= C[:, 1].std()


def plot_trajectories(est: np.ndarray, gt: Optional[np.ndarray], path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.plot(est[:, 0], est[:, 1], "b-", label="estimate")
    if gt is not None:
        ax.plot(gt[:, 0], gt[:, 1], "r--", label="ground truth")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
