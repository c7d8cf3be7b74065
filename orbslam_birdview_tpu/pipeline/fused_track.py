"""Fused per-frame tracking step: ONE device dispatch per tracked frame.

Round-1 tracking (`tracking.py`) orchestrated 5-8 separate device calls per
frame (extract → frustum gate → match → pose opt → local-map match → pose
opt), each with a blocking host readback. On real deployments dispatch costs
~0.1 ms, but the host↔device round trips still serialize the frame; on the
dev tunnel (29 ms RTT per call) they dominate wall-clock outright.

This module fuses the whole OK-state frame path of the reference
(`Tracking::TrackWithMotionModel` src/Tracking.cc:1190-1325 +
`Tracking::TrackLocalMap` :1327-1421) into a single jitted program:

  extract ORB → project local-map candidates under the motion-model pose →
  match (narrow, widen if <20) → motion-only LM → re-project under the
  refined pose → tight re-match → final LM with chi² reclassification

Key economy: the (P_cap × K_cap) Hamming matrix is computed ONCE per frame
(one int8 MXU matmul); every matching stage is a masked min-reduction over
it — re-matching after pose refinement only changes the window mask, never
the distances.

The local-map candidate bundle (`LocalMapDevice`) is a device-resident
snapshot of the tracker's local map, refreshed on keyframe events (the
reference re-votes the local map every frame, but between keyframes it is
nearly constant — `Tracking::UpdateLocalKeyFrames` src/Tracking.cc:1676-1790
seeds it from the same covisibility graph we snapshot). Host reads back ONE
packed summary vector per frame; full keypoint data is fetched only when a
keyframe is created.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..frontend import matcher, orb
from ..frontend.keypoints import Keypoints, unpack_bits_to_pm1
from ..graph import pose_opt
from . import device_ops


class LocalMapDevice(NamedTuple):
    """Padded device snapshot of the local-map candidates (front camera)."""

    pos: jnp.ndarray        # (P,3) f32 world positions
    normal: jnp.ndarray     # (P,3) f32 viewing normals
    min_dist: jnp.ndarray   # (P,) f32 scale-band lower
    max_dist: jnp.ndarray   # (P,) f32 scale-band upper
    valid: jnp.ndarray      # (P,) bool
    desc_u8: jnp.ndarray    # (P,32) u8 — unpacked to ±1 on device

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


class BirdMapDevice(NamedTuple):
    """Padded device snapshot of BEV ground landmarks + last-frame BEV kps."""

    pos: jnp.ndarray        # (Pb,3) f32 world positions
    valid: jnp.ndarray      # (Pb,) bool
    desc_u8: jnp.ndarray    # (Pb,32) u8

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


class FusedOutput(NamedTuple):
    kp: Keypoints           # full frame keypoints (device; fetched lazily)
    summary: jnp.ndarray    # tiny per-frame readback — ONE ~64 B transfer
    # device-resident pose chain for lag-N pipelining: the next frame's
    # step consumes these WITHOUT a host round trip
    R: jnp.ndarray = None          # (3,3) final pose (device)
    t: jnp.ndarray = None          # (3,)
    R_pred_next: jnp.ndarray = None  # (3,3) motion-model prediction for t+1
    t_pred_next: jnp.ndarray = None  # (3,)
    # per-keypoint candidate slot (device; fetched only when this frame
    # becomes a keyframe or an API consumer asks for associations)
    kp_slot: jnp.ndarray = None      # (K,) int32, -1 = no landmark
    # per-candidate visible/found counters accumulated ON DEVICE across
    # frames of one bundle epoch; fetched once per bundle refresh instead
    # of shipping a (P,) code vector home every frame. On the dev tunnel a
    # D2H fetch costs ~35 ms latency regardless of size — the per-frame
    # summary must stay tiny and everything else must ride batch fetches.
    vis_acc: jnp.ndarray = None      # (P,) int32
    found_acc: jnp.ndarray = None    # (P,) int32
    bird_kp: Optional[Keypoints] = None
    bird_base_xyz: Optional[jnp.ndarray] = None  # (Kb,3) base-frame points
    bird_slot: Optional[jnp.ndarray] = None      # (Kb,) int32 bird-candidate slot
    # depth modes: per-keypoint depth (RGB-D sample / stereo match) and
    # right-image u for stereo edges; -1 where unavailable
    kp_depth: Optional[jnp.ndarray] = None       # (K,) f32
    kp_ur: Optional[jnp.ndarray] = None          # (K,) f32

    # summary layout (f32):
    # [0:9] R row-major, [9:12] t, [12] n_inliers_front, [13] n_matched,
    # [14] n_inliers_bird, [15] n_kp


def _match_stage(ham, uv, ok, radius, pred_oct, kp_xy, kp_octave,
                 max_dist: int):
    """One masked min-reduction matching pass over the shared Hamming
    matrix (the window/eligibility mask is the only thing that varies)."""
    d2 = jnp.sum((uv[:, None, :] - kp_xy[None, :, :]) ** 2, axis=-1)
    mask = ok[:, None] & (d2 <= (radius[:, None] ** 2))
    if pred_oct is not None:
        mask = mask & (jnp.abs(kp_octave[None, :] - pred_oct[:, None]) <= 1)
    dist = jnp.where(mask, ham, matcher.BIG_DIST)
    best, idx = matcher._packed_min(dist, axis=1)
    found = best <= max_dist
    idx = jnp.where(found, idx, matcher.INVALID)
    return matcher.resolve_duplicate_targets(idx, best)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "fx", "fy", "cx", "cy", "width", "height",
                     "min_widen", "bird_cfg", "bv", "bf"))
def track_step_mono(
    img,
    R_pred,
    t_pred,
    lm: LocalMapDevice,
    scale_factors,     # (L,) f32
    inv_sigma2,        # (L,) f32 = 1/level_sigma2
    cfg: orb.ORBConfig,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int,
    radius_mult_motion: float = 6.0,   # motion_search_radius / 2.5
    radius_mult_local: float = 1.2,    # local_search_radius / 2.5
    min_widen: int = 20,
    R_last=None,
    t_last=None,
    vis_acc=None,      # (P,) int32 running visible counters (device)
    found_acc=None,    # (P,) int32 running found counters (device)
    # ---- optional birdview stream (the fork's signature mode) ----------
    bird_img=None,     # (Hb,Wb) BEV image
    bird_mask=None,    # (Hb,Wb) f32 validity mask or None
    bird_lm: Optional[BirdMapDevice] = None,   # ground-landmark bundle
    bird_cfg: Optional[orb.ORBConfig] = None,  # static
    bv=None,           # static BirdviewCamera (hashable NamedTuple)
    R_bc=None, t_bc=None,    # (3,3),(3,) camera->base extrinsics (device)
    bird_radius: float = 15.0,   # BEV search window (px)
    bird_info: float = 400.0,    # info weight per bird edge (1/sigma_m^2)
    # ---- depth modes ---------------------------------------------------
    depth_map=None,    # (H,W) RGB-D depth in meters (<=0 invalid)
    img_right=None,    # (H,W) right stereo image
    bf: float = 0.0,   # stereo baseline*fx (static)
) -> FusedOutput:
    """One fused tracking step. When (R_last, t_last) are given, the step
    also emits the motion-model prediction for the NEXT frame
    (vel·T_cur with vel = T_cur·T_last⁻¹, `Tracking::Track`
    src/Tracking.cc:552-559) so consecutive frames chain on device with no
    host round trip (lag-N pipelining).

    With the bird arguments set, the step also extracts BEV ORB, matches
    the ground-landmark bundle by projection under each pose estimate, and
    adds bird point-to-point edges to BOTH pose optimizations — the
    device-side fusion of `SearchByProjectionBird` + the bird edges of
    `PoseOptimizationWithBirdview` (src/OptimizerBirdview.cc:299-702).
    New bird landmarks are minted host-side at keyframes (PARITY.md)."""
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)
    kp = orb.extract_orb(img, cfg)
    depth_out = {}
    if depth_map is not None:
        # RGB-D: nearest-sample the depth image at the keypoints
        # (`Frame::ComputeStereoFromRGBD`, src/Frame.cc:840-867)
        dm = depth_map.astype(jnp.float32)
        H_, W_ = dm.shape
        xi = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W_ - 1)
        yi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H_ - 1)
        d = dm[yi, xi]
        d = jnp.where((d > 0) & kp.valid, d, -1.0)
        ur = jnp.where(d > 0, kp.xy[:, 0] - bf / jnp.maximum(d, 1e-9), -1.0)
        depth_out = dict(kp_depth=d, kp_ur=ur)
    elif img_right is not None:
        # stereo: extract the right image IN the same program and match
        # the tracking keypoints directly — no host splat/resample hop
        # (`Frame::ComputeStereoMatches`, src/Frame.cc:662-838)
        from ..frontend import stereo as stereo_mod

        if img_right.dtype != jnp.float32:
            img_right = img_right.astype(jnp.float32)
        kr = orb.extract_orb(img_right, cfg)
        sidx, sdisp = stereo_mod.stereo_match(kp, kr)
        sidx, sdisp, s_ur = stereo_mod.refine_stereo_subpixel(
            img, img_right, kp, kr, sidx, sdisp)
        d = jnp.where(sdisp > 0, bf / jnp.maximum(sdisp, 1e-6), -1.0)
        depth_out = dict(kp_depth=d,
                         kp_ur=jnp.where(sdisp > 0, s_ur, -1.0))
    P = lm.capacity
    n_levels = scale_factors.shape[0]
    log_scale = jnp.log(scale_factors[1]) if n_levels > 1 else jnp.float32(0.18)

    lm_pm1 = unpack_bits_to_pm1(lm.desc_u8)
    ham = matcher.hamming_matrix(lm_pm1, kp.desc_pm1, lm.valid, kp.valid)

    def gate(R, t):
        return device_ops.frustum_gate(
            R, t, lm.pos, lm.normal, lm.min_dist, lm.max_dist, lm.valid,
            fx, fy, cx, cy, width, height, n_levels, log_scale)

    # ---- birdview stream setup -----------------------------------------
    have_bird = bird_img is not None and bird_lm is not None
    bird_args1 = bird_args2 = {}
    if have_bird:
        if bird_img.dtype != jnp.float32:
            bird_img = bird_img.astype(jnp.float32)
        bkp = orb.extract_orb(bird_img, bird_cfg, mask=bird_mask)
        base_xy = bv.pixel_to_base_xy(bkp.xy)
        base_xyz = jnp.concatenate(
            [base_xy, jnp.zeros((base_xy.shape[0], 1), base_xy.dtype)], -1)
        R_cb = R_bc.T
        t_cb = -R_cb @ t_bc
        obs_pc = base_xyz @ R_cb.T + t_cb    # camera-frame observations
        bird_pm1 = unpack_bits_to_pm1(bird_lm.desc_u8)
        bham = matcher.hamming_matrix(bird_pm1, bkp.desc_pm1,
                                      bird_lm.valid, bkp.valid)
        Pb = bird_lm.capacity
        rad_b = jnp.full((Pb,), bird_radius, jnp.float32)

        def bird_match(R, t):
            # world -> vehicle base of the current pose: Tbc · Tcw
            Rbw = R_bc @ R
            tbw = R_bc @ t + t_bc
            pb = bird_lm.pos @ Rbw.T + tbw
            on_plane = jnp.abs(pb[:, 2]) < 0.2    # ORBmatcher.cc:1971
            buv = bv.base_xy_to_pixel(pb[:, :2])
            bok = on_plane & bv.in_image(buv) & bird_lm.valid
            return _match_stage(bham, buv, bok, rad_b, None,
                                bkp.xy, bkp.octave, matcher.TH_HIGH)

        def bird_lm_args(bidx):
            return dict(
                Xw_bird=bird_lm.pos,
                obs_pc_bird=obs_pc[jnp.maximum(bidx, 0)],
                info_bird=jnp.full((Pb,), bird_info, jnp.float32),
                valid_bird=bidx >= 0,
            )

        bidx1 = bird_match(R_pred, t_pred)
        bird_args1 = bird_lm_args(bidx1)

    # ---- stage 1: motion-model match (narrow, widen when starved) ------
    uv1, oct1, radf1, ok1 = gate(R_pred, t_pred)
    sf1 = scale_factors[jnp.clip(oct1, 0, n_levels - 1)]
    r_narrow = radf1 * radius_mult_motion * sf1
    idx_n = _match_stage(ham, uv1, ok1, r_narrow, oct1, kp.xy, kp.octave,
                         matcher.TH_HIGH)
    n_narrow = jnp.sum((idx_n >= 0).astype(jnp.int32))
    idx_w = _match_stage(ham, uv1, ok1, r_narrow * 2.0, oct1, kp.xy,
                         kp.octave, matcher.TH_HIGH)
    idx1 = jnp.where(n_narrow >= min_widen, idx_n, idx_w)

    info_of = lambda idx: inv_sigma2[
        jnp.clip(kp.octave[jnp.maximum(idx, 0)], 0, n_levels - 1)]
    obs1 = kp.xy[jnp.maximum(idx1, 0)]
    res1 = pose_opt.optimize_pose(
        R_pred, t_pred, lm.pos, obs1, info_of(idx1), idx1 >= 0,
        fx, fy, cx, cy, rounds=2, **bird_args1)

    # ---- stage 2: local-map re-match under the refined pose -------------
    uv2, oct2, radf2, ok2 = gate(res1.R, res1.t)
    sf2 = scale_factors[jnp.clip(oct2, 0, n_levels - 1)]
    r2 = radf2 * radius_mult_local * sf2
    idx2 = _match_stage(ham, uv2, ok2, r2, oct2, kp.xy, kp.octave,
                        matcher.TH_HIGH)
    # keep stage-1 inlier associations for candidates stage 2 lost
    # (`TrackLocalMap` only ADDS matches on top of the motion-model set)
    idx2 = jnp.where(idx2 >= 0, idx2,
                     jnp.where(res1.inliers_mono, idx1, matcher.INVALID))
    idx2 = matcher.resolve_duplicate_targets(
        idx2, jnp.where(idx2 >= 0, 0, matcher.BIG_DIST)
        + jnp.take_along_axis(
            ham, jnp.maximum(idx2, 0)[:, None], axis=1)[:, 0])
    obs2 = kp.xy[jnp.maximum(idx2, 0)]
    if have_bird:
        bidx2 = bird_match(res1.R, res1.t)
        # keep stage-1 bird inliers where the re-match lost them
        bidx2 = jnp.where(bidx2 >= 0, bidx2,
                          jnp.where(res1.inliers_bird, bidx1,
                                    matcher.INVALID))
        bidx2 = matcher.resolve_duplicate_targets(
            bidx2, jnp.where(bidx2 >= 0, 0, matcher.BIG_DIST)
            + jnp.take_along_axis(
                bham, jnp.maximum(bidx2, 0)[:, None], axis=1)[:, 0])
        bird_args2 = bird_lm_args(bidx2)
    res2 = pose_opt.optimize_pose(
        res1.R, res1.t, lm.pos, obs2, info_of(idx2), idx2 >= 0,
        fx, fy, cx, cy, rounds=4, **bird_args2)

    final_inl = res2.inliers_mono & (idx2 >= 0)
    visible = ok1 | ok2
    found = final_inl
    n_inl = jnp.sum(final_inl.astype(jnp.int32))
    n_matched = jnp.sum((idx2 >= 0).astype(jnp.int32))

    # keypoint -> candidate slot (inliers only)
    K = kp.capacity
    kp_slot = jnp.full((K,), -1, jnp.int32)
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    kp_slot = kp_slot.at[jnp.where(final_inl, idx2, K)].set(
        slot_ids, mode="drop")

    n_inl_bird = jnp.float32(0.0)
    bird_out = {}
    if have_bird:
        bfinal = res2.inliers_bird & (bird_args2["valid_bird"])
        n_inl_bird = jnp.sum(bfinal.astype(jnp.int32)).astype(jnp.float32)
        Kb = bkp.capacity
        bird_slot = jnp.full((Kb,), -1, jnp.int32)
        bslot_ids = jnp.arange(Pb, dtype=jnp.int32)
        bird_slot = bird_slot.at[jnp.where(bfinal, bidx2, Kb)].set(
            bslot_ids, mode="drop")
        bird_out = dict(bird_kp=bkp, bird_base_xyz=base_xyz,
                        bird_slot=bird_slot)

    if vis_acc is None:
        vis_acc = jnp.zeros((P,), jnp.int32)
    if found_acc is None:
        found_acc = jnp.zeros((P,), jnp.int32)
    vis_acc = vis_acc + visible.astype(jnp.int32)
    found_acc = found_acc + found.astype(jnp.int32)
    summary = jnp.concatenate([
        res2.R.reshape(-1), res2.t,
        jnp.stack([n_inl.astype(jnp.float32),
                   n_matched.astype(jnp.float32),
                   n_inl_bird.astype(jnp.float32),
                   kp.count().astype(jnp.float32)]),
    ])
    R_np, t_np = None, None
    if R_last is not None:
        # vel = T_cur · T_last⁻¹;  T_pred(next) = vel · T_cur
        Rv = res2.R @ R_last.T
        tv = res2.t - Rv @ t_last
        R_np = Rv @ res2.R
        t_np = Rv @ res2.t + tv
        # re-orthonormalize: chained f32 rotation products drift off the
        # manifold GEOMETRICALLY (measured doubling per frame, reaching
        # 0.3 deviation within ~25 chained frames); two Newton iterations
        # of the polar decomposition R ← 1.5R − 0.5·R·RᵀR restore
        # orthonormality to f32 precision
        for _ in range(2):
            R_np = 1.5 * R_np - 0.5 * R_np @ (R_np.T @ R_np)
    return FusedOutput(kp=kp, summary=summary, R=res2.R, t=res2.t,
                       R_pred_next=R_np, t_pred_next=t_np,
                       kp_slot=kp_slot, vis_acc=vis_acc,
                       found_acc=found_acc, **bird_out, **depth_out)


def unpack_summary(summary_np):
    """Host-side view of the tiny per-frame summary vector."""
    return dict(
        R=summary_np[0:9].reshape(3, 3).astype("float32"),
        t=summary_np[9:12].astype("float32"),
        n_inliers=int(summary_np[12]),
        n_matched=int(summary_np[13]),
        n_inliers_bird=int(summary_np[14]),
        n_kp=int(summary_np[15]),
    )
