"""Synthetic world rendering for end-to-end tests and benchmarks.

The reference has no tests (SURVEY §4); its de-facto acceptance test is ATE
on TUM/KITTI sequences, which are not shippable. This module renders
deterministic synthetic sequences with exact ground truth:

- front camera: a textured plane (wall) viewed by a moving camera — image
  formation is an exact homography warp of the texture;
- BEV camera: a textured ground plane seen top-down around the vehicle —
  exact affine warp with the metric pixel<->meter calibration.

ATE against the known trajectory is the same acceptance metric the
reference uses, minus the dataset dependency.
"""
from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np

from ..core.camera import BirdviewCamera, PinholeCamera


def make_texture(seed: int, size: int = 2048, n_blobs: int = 4000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    tex = rng.uniform(20, 70, (size, size)).astype(np.float32)
    ys = rng.integers(5, size - 40, n_blobs)
    xs = rng.integers(5, size - 40, n_blobs)
    hs = rng.integers(4, 36, n_blobs)
    ws = rng.integers(4, 36, n_blobs)
    vals = rng.uniform(50, 185, n_blobs)
    for y, x, h, w, v in zip(ys, xs, hs, ws, vals):
        tex[y : y + h, x : x + w] += v
    tex = cv2.GaussianBlur(np.clip(tex, 0, 255), (3, 3), 0.8)
    return np.clip(tex, 0, 255).astype(np.float32)


def render_wall_view(cam: PinholeCamera, tex: np.ndarray, R_cw: np.ndarray,
                     t_cw: np.ndarray, wall_z: float,
                     meters_per_tex: float = 0.005) -> np.ndarray:
    """Render the camera view of the textured plane z=wall_z (world frame).

    Texture pixel (tx,ty) maps to world (x,y) = ((tx,ty) − size/2)·mpt.
    """
    size = tex.shape[0]
    A = np.array(
        [[meters_per_tex, 0.0, -size / 2 * meters_per_tex],
         [0.0, meters_per_tex, -size / 2 * meters_per_tex],
         [0.0, 0.0, 1.0]], np.float64)
    Hc = np.column_stack([R_cw[:, 0], R_cw[:, 1],
                          wall_z * R_cw[:, 2] + t_cw]).astype(np.float64)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float64)
    H = K @ Hc @ A
    return cv2.warpPerspective(tex, H, (cam.width, cam.height),
                               flags=cv2.INTER_LINEAR)


def render_bev(bv: BirdviewCamera, ground: np.ndarray, x: float, y: float,
               yaw: float, meters_per_tex: float = 0.02) -> np.ndarray:
    """Top-down view of the ground texture around vehicle pose (x,y,yaw)."""
    size = ground.shape[0]
    h, w = bv.height, bv.width
    # BEV pixel -> base xy -> world xy -> texture px
    us, vs = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    bx = (h / 2.0 - vs) * bv.pixel2meter + bv.rear_axle_to_center
    by = (w / 2.0 - us) * bv.pixel2meter
    c, s = np.cos(yaw), np.sin(yaw)
    wx = x + c * bx - s * by
    wy = y + s * bx + c * by
    tx = (wx / meters_per_tex + size / 2).astype(np.float32)
    ty = (wy / meters_per_tex + size / 2).astype(np.float32)
    return cv2.remap(ground, tx, ty, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=0)


@dataclass
class WallSequence:
    """Camera translating laterally in front of a wall at z=wall_z, with a
    gentle push-in; exact ground truth poses (world→cam)."""

    cam: PinholeCamera
    n_frames: int = 60
    wall_z: float = 4.0
    step: float = 0.02        # meters per frame along +x
    push: float = 0.004       # meters per frame along +z
    yaw_rate: float = 0.0
    seed: int = 3

    def __post_init__(self):
        self.tex = make_texture(self.seed)

    def gt_pose(self, i: int):
        """Returns (R_cw, t_cw): world→camera."""
        yaw = self.yaw_rate * i
        c, s = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        p = np.array([self.step * i, 0.0, self.push * i], np.float32)
        R_cw = R_wc.T
        t_cw = -R_cw @ p
        return R_cw, t_cw

    def frame(self, i: int):
        R_cw, t_cw = self.gt_pose(i)
        img = render_wall_view(self.cam, self.tex, R_cw.astype(np.float64),
                               t_cw.astype(np.float64), self.wall_z)
        return img, (R_cw, t_cw)

    def depth(self, i: int) -> np.ndarray:
        """Exact per-pixel depth (camera z) of the wall plane."""
        R_cw, t_cw = self.gt_pose(i)
        R_wc = R_cw.T
        p = -R_wc @ t_cw
        cam = self.cam
        us, vs = np.meshgrid(np.arange(cam.width, dtype=np.float64),
                             np.arange(cam.height, dtype=np.float64))
        xn = (us - cam.cx) / cam.fx
        yn = (vs - cam.cy) / cam.fy
        dw_z = R_wc[2, 0] * xn + R_wc[2, 1] * yn + R_wc[2, 2]
        depth = (self.wall_z - p[2]) / np.maximum(dw_z, 1e-9)
        return depth.astype(np.float32)


def degrade(img: np.ndarray, i: int, rng: np.random.Generator,
            noise_std: float = 0.0, blur_px: int = 0,
            exposure_amp: float = 0.0, exposure_period: int = 80,
            occluders: int = 0, occluder_size: int = 120,
            blackout: bool = False) -> np.ndarray:
    """Hostile-imaging model for stress tests: the clean homography renders
    have no photometric noise, blur, exposure change, or occlusion —
    nothing that stresses FAST thresholds or descriptor matching the way
    TUM/KITTI-class data does (the reference's de-facto acceptance data).

    - noise_std: additive Gaussian intensity noise (sensor noise)
    - blur_px: horizontal box blur (motion blur), odd width applied
    - exposure_amp: multiplicative gain swinging ±amp over exposure_period
      frames (auto-exposure drift)
    - occluders: N gray rectangles sweeping across the image (dynamic
      foreground objects with NO valid texture)
    - blackout: the frame is black (dropped exposure / tunnel)
    """
    out = np.asarray(img, np.float32).copy()
    if blackout:
        return np.zeros_like(out)
    if exposure_amp:
        out *= 1.0 + exposure_amp * np.sin(2 * np.pi * i / exposure_period)
    if blur_px and blur_px > 1:
        out = cv2.blur(out, (blur_px, 1))
    if occluders:
        h, w = out.shape[:2]
        for k in range(occluders):
            # deterministic sweep: each occluder crosses the frame over
            # ~120 frames at its own phase/row
            x0 = int((i * (7 + 3 * k) + k * 211) % (w + occluder_size)) \
                - occluder_size
            y0 = int((k * 313) % max(h - occluder_size, 1))
            x1 = max(x0, 0)
            out[y0:y0 + occluder_size,
                x1:max(x0 + occluder_size, 0)] = 90.0 + 20.0 * k
    if noise_std:
        out += rng.normal(0.0, noise_std, out.shape)
    return np.clip(out, 0, 255)


def render_box_view(cam: PinholeCamera, textures, R_cw: np.ndarray,
                    t_cw: np.ndarray, box_half: float = 8.0,
                    meters_per_tex: float = 0.01) -> np.ndarray:
    """Ray-cast view of a textured square room (4 vertical walls at
    x=±box_half, y=±box_half, world z vertical), one DISTINCT texture per
    wall — a self-similar room would (correctly) trigger false loop
    closures. Rotating cameras always see texture."""
    if isinstance(textures, np.ndarray):
        textures = [textures] * 4
    R_wc = R_cw.T
    p = -R_wc @ t_cw
    us, vs = np.meshgrid(np.arange(cam.width, dtype=np.float64),
                         np.arange(cam.height, dtype=np.float64))
    d_cam = np.stack([(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy,
                      np.ones_like(us)], -1)
    d_w = d_cam @ R_wc.T  # (H,W,3)
    best_t = np.full(us.shape, np.inf)
    img = np.zeros(us.shape, np.float32)
    walls = [
        (0, +box_half, 1, 2),    # x=+D, params (y, z)
        (0, -box_half, 1, 2),
        (1, +box_half, 0, 2),    # y=+D, params (x, z)
        (1, -box_half, 0, 2),
    ]
    with np.errstate(divide="ignore", invalid="ignore"):
        for tex, (axis, D, pa, pb) in zip(textures, walls):
            size = tex.shape[0]
            dv = d_w[..., axis]
            t = (D - p[axis]) / dv
            hit = (t > 0.1) & (t < best_t) & np.isfinite(t)
            a = p[pa] + t * d_w[..., pa]
            b = p[pb] + t * d_w[..., pb]
            tx = np.where(hit, (a / meters_per_tex + size / 2) % size, 0.0)
            ty = np.where(hit, (b / meters_per_tex + size / 2) % size, 0.0)
            wall_img = cv2.remap(tex, tx.astype(np.float32),
                                 ty.astype(np.float32), cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_WRAP)
            img = np.where(hit, wall_img, img)
            best_t = np.where(hit, t, best_t)
    return img.astype(np.float32)


@dataclass
class BirdSequence:
    """Vehicle driving on a textured ground plane: front camera sees a wall
    ahead, BEV camera sees the ground. Metric ground truth."""

    cam: PinholeCamera
    bv: BirdviewCamera
    n_frames: int = 60
    speed: float = 0.12       # m per frame along +x (vehicle forward)
    yaw_rate: float = 0.004
    wall_x: float = 14.0      # wall ahead, world plane x=wall_x
    seed: int = 5

    def __post_init__(self):
        self.ground = make_texture(self.seed, size=4096)
        self.wall = [make_texture(self.seed + 1 + i) for i in range(4)]
        # camera→base: camera z forward (+x base), x right (−y base),
        # y down (−z base); mounted at base origin, height 1.2 m
        self.R_bc = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        self.t_bc = np.array([0.0, 0.0, 1.2], np.float32)

    def gt_pose2d(self, i: int):
        yaw = self.yaw_rate * i
        if abs(self.yaw_rate) < 1e-9:
            x = self.speed * i
            y = 0.0
        else:
            r = self.speed / self.yaw_rate
            x = r * np.sin(yaw)
            y = r * (1 - np.cos(yaw))
        return x, y, yaw

    def gt_cam_pose(self, i: int):
        """World→camera SE3 from the vehicle 2D pose + extrinsics."""
        x, y, yaw = self.gt_pose2d(i)
        c, s = np.cos(yaw), np.sin(yaw)
        R_wb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t_wb = np.array([x, y, 0], np.float32)
        R_wc = R_wb @ self.R_bc
        t_wc = R_wb @ self.t_bc + t_wb
        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        return R_cw, t_cw

    def frame(self, i: int):
        x, y, yaw = self.gt_pose2d(i)
        bev = render_bev(self.bv, self.ground, x, y, yaw)
        R_cw, t_cw = self.gt_cam_pose(i)
        img = render_box_view(self.cam, self.wall,
                              R_cw.astype(np.float64), t_cw.astype(np.float64),
                              box_half=self.wall_x)
        return img, bev, (R_cw, t_cw)


@dataclass
class CircleSequence:
    """Monocular camera orbiting inside a textured box room — KITTI-style
    revisits: the trajectory closes a loop every `frames_per_rev` frames.
    Same vehicle-on-ground pose math as BirdSequence, no BEV stream."""

    cam: PinholeCamera
    n_frames: int = 400
    speed: float = 0.05        # m per frame along heading
    frames_per_rev: int = 400
    box_half: float = 10.0
    seed: int = 7

    def __post_init__(self):
        self.walls = [make_texture(self.seed + i) for i in range(4)]
        self.R_bc = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        self.t_bc = np.array([0.0, 0.0, 1.2], np.float32)
        self.yaw_rate = 2 * np.pi / self.frames_per_rev

    def gt_pose(self, i: int):
        yaw = self.yaw_rate * i
        r = self.speed / self.yaw_rate
        x = r * np.sin(yaw)
        y = r * (1 - np.cos(yaw))
        c, s = np.cos(yaw), np.sin(yaw)
        R_wb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        R_wc = R_wb @ self.R_bc
        t_wc = R_wb @ self.t_bc + np.array([x, y, 0], np.float32)
        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        return R_cw, t_cw

    def frame(self, i: int):
        R_cw, t_cw = self.gt_pose(i)
        img = render_box_view(self.cam, self.walls, R_cw.astype(np.float64),
                              t_cw.astype(np.float64),
                              box_half=self.box_half)
        return img, (R_cw, t_cw)


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray,
             align: bool = True, with_scale: bool = False):
    """Absolute trajectory error after optional Umeyama alignment — the TUM
    evaluation metric."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape
    if align:
        mu_e, mu_g = est.mean(0), gt.mean(0)
        E, G = est - mu_e, gt - mu_g
        W = G.T @ E / len(est)
        U, d, Vt = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        if with_scale:
            var_e = (E * E).sum() / len(est)
            s = np.trace(np.diag(d) @ S) / max(var_e, 1e-12)
        else:
            s = 1.0
        t = mu_g - s * R @ mu_e
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))
