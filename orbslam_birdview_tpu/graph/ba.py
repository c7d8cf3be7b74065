"""Bundle adjustment with explicit Schur complement, fully batched.

Replaces g2o's SparseOptimizer + BlockSolver_6_3 machinery
(`/root/reference/Thirdparty/g2o`, driven by `src/OptimizerBirdview.cc`
`LocalBundleAdjustmentWithBirdview` `:704-1208` and
`(Global)BundleAdjustmentWithBirdview` `:24-297`) with a dense-block Schur
design chosen for the MXU:

- Landmarks (front 3D points and BEV ground points live in ONE combined
  vertex array) are eliminated analytically: Hpp is block-diagonal 3x3.
- The camera-landmark coupling W is materialized as a dense (6C, P, 3)
  tensor — at SLAM scales (C ≤ 64 cameras, P ≤ 16k points) this is a few
  MB and turns the Schur product S = Hcc − W Hpp⁻¹ Wᵀ into one big matmul.
- The reduced camera system (6C × 6C) is solved densely.

Edge types: monocular reprojection, stereo reprojection (the reference left
these as TODOs in its birdview optimizers — implemented for real here), and
BEV 3D point-to-point. Robust Huber weights, per-round outlier
re-classification (5.991 / 7.815 gates) mirror the reference's 5+10
iteration local-BA protocol.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import lie, robust, linalg
from . import residuals

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_BIRD = 7.815


class EdgeSet(NamedTuple):
    """Padded edge list. obs is (E,2) mono, (E,3) stereo (u,v,uR) or (E,3)
    bird (camera-frame point)."""

    cam: jnp.ndarray   # (E,) int32
    pt: jnp.ndarray    # (E,) int32 — index into the combined landmark array
    obs: jnp.ndarray
    info: jnp.ndarray  # (E,)
    valid: jnp.ndarray


class BAResult(NamedTuple):
    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    points: jnp.ndarray
    inl_mono: jnp.ndarray
    inl_stereo: jnp.ndarray
    inl_bird: jnp.ndarray
    cost: jnp.ndarray


def _inv3x3(A):
    """Batched closed-form 3x3 inverse for PSD blocks; A (…,3,3).

    Jacobi-equilibrated adjugate: B = D^-½ A D^-½ (unit diagonal) is
    inverted in closed form, then unscaled. Raw cofactor expansion is
    numerically fatal at f32 for ill-conditioned Hpp blocks (a landmark
    with one mono observation has rank-2 JᵀJ at scale s≈(f/z)²~10³; its
    true det ~ s²·λ is BELOW the cancellation noise s³·2⁻²⁴ of the raw
    expansion, so the computed det — and hence the inverse — is garbage,
    NaN-ing the Schur solve on TPU). After equilibration every cofactor
    is O(1) and det(B) ∈ [0,1], so f32 round-off (~2⁻²⁴ absolute) is
    harmless; det is clamped from below (PSD ⇒ det ≥ 0 exactly; tiny or
    round-off-negative dets mean a singular block, which LM damping
    regularizes on the next iteration anyway)."""
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
    B = A * s[..., :, None] * s[..., None, :]
    a, b, c = B[..., 0, 0], B[..., 0, 1], B[..., 0, 2]
    d, e, f = B[..., 1, 0], B[..., 1, 1], B[..., 1, 2]
    g, h, i = B[..., 2, 0], B[..., 2, 1], B[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.maximum(det, 1e-6)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    inv_B = adj / det[..., None, None]
    return inv_B * s[..., :, None] * s[..., None, :]


def _damp(H, lam, floor=1e-6):
    """Marquardt damping: H + λ·diag(max(diag H, floor)) — scale-free,
    unlike λ·I (`g2o` additive default). For f32 TPU this is essential:
    additive λ=1e-4 leaves a one-observation Hpp block at condition
    ~(f/z)²/λ ≈ 2²⁴ (unsolvable in f32), multiplicative bounds it by
    ~(1+λ)/λ ≈ 10⁴. It also prevents the huge |dxp| candidate steps that
    additive damping allows along weakly-observed directions (ceres'
    default for the same reason)."""
    n = H.shape[-1]
    d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), floor)
    return H + jnp.eye(n, dtype=H.dtype) * (lam * d)[..., None, :]


def _edge_terms(kind, cam_R, cam_t, points, es: EdgeSet, intr, use_huber):
    """Residual/Jacobian/weight per edge. kind in {mono, stereo, bird}."""
    R = cam_R[es.cam]
    t = cam_t[es.cam]
    X = points[es.pt]
    fx, fy, cx, cy, bf = intr
    if kind == "mono":
        e, Jc, Jp, ok = residuals.mono_reproj(R, t, X, es.obs, fx, fy, cx, cy)
        chi_th = CHI2_MONO
    elif kind == "stereo":
        e, Jc, Jp, ok = residuals.stereo_reproj(R, t, X, es.obs, fx, fy, cx, cy, bf)
        chi_th = CHI2_STEREO
    else:
        e, Jc, Jp = residuals.bird_point(R, t, X, es.obs)
        ok = jnp.ones(e.shape[0], bool)
        chi_th = CHI2_BIRD
    chi2 = jnp.sum(e * e, axis=-1) * es.info
    w_rob = jnp.where(use_huber, robust.huber_weight(chi2, chi_th), 1.0)
    w = w_rob * es.info * (es.valid & ok).astype(e.dtype)
    cost = jnp.sum(
        jnp.where(
            es.valid & ok,
            jnp.where(use_huber, robust.huber_rho(chi2, chi_th), chi2),
            0.0,
        )
    )
    # cheirality-gated edges pay a fixed penalty: otherwise an LM step that
    # throws points behind the camera zeroes the masked cost and gets
    # ACCEPTED as a "perfect" solution (degenerate minimum of the mask)
    cost = cost + 10.0 * chi_th * jnp.sum((es.valid & ~ok).astype(e.dtype))
    return e, Jc, Jp, w, cost, chi2, ok


def _cost_only(cam_R, cam_t, points, edge_sets, intr, use_huber):
    """Total cost without Jacobian/Hessian assembly — candidate-step
    evaluation inside LM (the full `_assemble` materializes the (C,6,P,3)
    coupling tensor W; skipping it halves the per-iteration work)."""
    fx, fy, cx, cy, bf = intr
    total = None
    for kind, es in edge_sets:
        if es is None:
            continue
        R = cam_R[es.cam]
        t = cam_t[es.cam]
        X = points[es.pt]
        if kind == "mono":
            e, chi2, ok = residuals.mono_reproj_cost(
                R, t, X, es.obs, es.info, fx, fy, cx, cy)
            chi_th = CHI2_MONO
        elif kind == "stereo":
            Xc = residuals._rot(R, X) + t
            z = Xc[:, 2]
            zi = 1.0 / jnp.maximum(z, 1e-9)
            u = fx * Xc[:, 0] * zi + cx
            v = fy * Xc[:, 1] * zi + cy
            pred = jnp.stack([u, v, u - bf * zi], -1)
            e = es.obs - pred
            chi2 = jnp.sum(e * e, -1) * es.info
            ok = z > 1e-6
            chi_th = CHI2_STEREO
        else:
            e = es.obs - (residuals._rot(R, X) + t)
            chi2 = jnp.sum(e * e, -1) * es.info
            ok = jnp.ones(e.shape[0], bool)
            chi_th = CHI2_BIRD
        cost = jnp.sum(jnp.where(
            es.valid & ok,
            jnp.where(use_huber, robust.huber_rho(chi2, chi_th), chi2), 0.0))
        cost = cost + 10.0 * chi_th * jnp.sum((es.valid & ~ok).astype(e.dtype))
        total = cost if total is None else total + cost
    return total if total is not None else jnp.asarray(0.0, cam_R.dtype)


def _classify(kind, cam_R, cam_t, points, es: EdgeSet, intr):
    _, _, _, _, _, chi2, ok = _edge_terms(kind, cam_R, cam_t, points, es, intr, False)
    th = {"mono": CHI2_MONO, "stereo": CHI2_STEREO, "bird": CHI2_BIRD}[kind]
    return es.valid & ok & (chi2 <= th)


def _gram(Ja, w, Jb):
    """Σ_i Ja[n,i,j]·w[n]·Jb[n,i,k] -> (n,j,k), as a broadcast
    multiply-reduce. einsum would lower these huge batches of tiny (≤3-dim
    contraction) matmuls to MXU dot_generals padded 3→128 per operand —
    ~40x wasted FLOPs and bf16 passes; the VPU form is exact f32 and
    bandwidth-bound."""
    return jnp.sum(Ja[:, :, :, None] * (w[:, None, None, None] * Jb[:, :, None, :]),
                   axis=1)


def _gramv(Ja, w, e):
    """Σ_i Ja[n,i,j]·w[n]·e[n,i] -> (n,j)."""
    return jnp.sum(Ja * (w[:, None] * e)[:, :, None], axis=1)


def _assemble(cam_R, cam_t, points, edge_sets, intr, use_huber, C, P):
    dtype = cam_R.dtype
    Hcc = jnp.zeros((C, 6, 6), dtype)
    bc = jnp.zeros((C, 6), dtype)
    Hpp = jnp.zeros((P, 3, 3), dtype)
    bp = jnp.zeros((P, 3), dtype)
    W = jnp.zeros((C, 6, P, 3), dtype)
    total_cost = jnp.asarray(0.0, dtype)
    for kind, es in edge_sets:
        if es is None:
            continue
        e, Jc, Jp, w, cost, _, _ = _edge_terms(
            kind, cam_R, cam_t, points, es, intr, use_huber
        )
        total_cost = total_cost + cost
        Hcc = Hcc.at[es.cam].add(_gram(Jc, w, Jc))
        bc = bc.at[es.cam].add(_gramv(Jc, w, e))
        Hpp = Hpp.at[es.pt].add(_gram(Jp, w, Jp))
        bp = bp.at[es.pt].add(_gramv(Jp, w, e))
        Wblk = _gram(Jc, w, Jp)  # (E,6,3)
        W = W.at[es.cam, :, es.pt, :].add(Wblk)
    return Hcc, bc, Hpp, bp, W, total_cost


def _schur_solve(Hcc, bc, Hpp, bp, W, lam, cam_free, pt_free, C, P):
    dtype = Hcc.dtype
    # damping
    dHcc = _damp(Hcc, lam)
    dHpp = _damp(Hpp, lam)
    # freeze invalid/fixed points by forcing their block to identity, rhs 0
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (P, 3, 3))
    dHpp = jnp.where(pt_free[:, None, None], dHpp, eye3)
    bp = jnp.where(pt_free[:, None], bp, 0.0)
    W = W * pt_free[None, None, :, None].astype(dtype)

    Hpp_inv = _inv3x3(dHpp)
    W3 = W.reshape(C * 6, P, 3)
    # Y[a,p,l] = Σ_k W3[a,p,k]·G[p,k,l]: broadcast-reduce on the VPU —
    # as an einsum this is 4096 batches of (96,3)@(3,3), which XLA pads
    # onto the MXU at ~3% utilization (measured 4.2 ms/iter; this form
    # is bandwidth-bound and exact f32)
    Y = jnp.sum(W3[:, :, :, None] * Hpp_inv[None], axis=2)
    S = jnp.zeros((C * 6, C * 6), dtype)
    # block-diagonal Hcc
    idx = jnp.arange(C)
    S = S.reshape(C, 6, C, 6).at[idx, :, idx, :].add(dHcc).reshape(C * 6, C * 6)
    # true matmul (contract P and 3 as a multi-dim dot_general): keep on
    # the MXU, f32 accumulation. Do NOT reshape to (C6, P*3) first — the
    # minor dim 3 is lane-padded 3->128 on TPU, and the reshape forces a
    # full physical relayout of both operands (measured 2.16 -> 1.65
    # ms/iter at C=16,P=4096 from dropping it; tools/time_schur_layout.py)
    S = S - jax.lax.dot_general(
        Y, W3, (((1, 2), (1, 2)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    rhs = bc.reshape(-1) - jnp.sum(Y * bp[None], axis=(1, 2))
    # freeze fixed cameras
    free6 = jnp.repeat(cam_free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = jnp.where(free6, rhs, 0.0)
    dxc = -jnp.linalg.solve(S, rhs)
    # bp − W^T (−dxc), then the 3x3 block solve — both broadcast-reduce
    tmp = bp + jnp.sum(W3 * dxc[:, None, None], axis=0)
    dxp = -jnp.sum(Hpp_inv * tmp[:, None, :], axis=-1)
    dxp = jnp.where(pt_free[:, None], dxp, 0.0)
    return dxc.reshape(C, 6), dxp


import functools


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "iters_phase1",
                     "iters_phase2", "reclassify"),
)
@linalg.f32_matmul
def bundle_adjust(
    cam_R,
    cam_t,
    cam_fixed,
    cam_valid,
    points,
    point_valid,
    mono: Optional[EdgeSet],
    stereo: Optional[EdgeSet],
    bird: Optional[EdgeSet],
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float = 0.0,
    iters_phase1: int = 5,
    iters_phase2: int = 10,
    reclassify: bool = True,
) -> BAResult:
    """Levenberg-Marquardt BA with Schur elimination.

    cam poses are Tcw; `cam_fixed` marks frontier/anchor keyframes whose
    poses must not move (`OptimizerBirdview.cc:840-870` fixes frontier KFs
    and KF id 0). Landmarks: one combined array (front 3D points then BEV
    points); each edge indexes it via `pt`.
    """
    C = cam_R.shape[0]
    P = points.shape[0]
    dtype = cam_R.dtype
    intr = (fx, fy, cx, cy, bf)
    cam_free = cam_valid & ~cam_fixed
    # points referenced by no valid edge must be frozen
    referenced = jnp.zeros((P,), bool)
    for es in (mono, stereo, bird):
        if es is not None:
            referenced = referenced.at[es.pt].max(es.valid)
    pt_free0 = point_valid & referenced

    def run_phase(state, n_iters, use_huber, msets):
        cam_R, cam_t, points = state

        def body(carry, _):
            cam_R, cam_t, points, lam = carry
            Hcc, bc, Hpp, bp, W, cost0 = _assemble(
                cam_R, cam_t, points, msets, intr, use_huber, C, P
            )
            dxc, dxp = _schur_solve(
                Hcc, bc, Hpp, bp, W, lam, cam_free, pt_free, C, P
            )
            Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
            pn = points + dxp
            cost1 = _cost_only(Rn, tn, pn, msets, intr, use_huber)
            # gate on the STEP's finiteness, not just cost1: a NaN pose
            # fails the z>0 depth check, silently dropping its edges from
            # cost1 — a NaN state can otherwise look like a cost decrease
            ok = ((cost1 < cost0) & jnp.isfinite(cost1)
                  & jnp.all(jnp.isfinite(dxc)) & jnp.all(jnp.isfinite(dxp)))
            cam_R = jnp.where(ok, Rn, cam_R)
            cam_t = jnp.where(ok, tn, cam_t)
            points = jnp.where(ok, pn, points)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-9, 1e8)
            # report the ACCEPTED state's cost (cost0 if the step was
            # rejected), not the candidate's
            return (cam_R, cam_t, points, lam), jnp.where(ok, cost1, cost0)

        (cam_R, cam_t, points, _), costs = jax.lax.scan(
            body, (cam_R, cam_t, points, jnp.asarray(1e-4, dtype)), None,
            length=n_iters,
        )
        return (cam_R, cam_t, points), costs[-1]

    pt_free = pt_free0
    msets = [("mono", mono), ("stereo", stereo), ("bird", bird)]
    state = (cam_R, cam_t, points)
    state, _ = run_phase(state, iters_phase1, True, msets)

    # outlier re-classification between phases (LocalBundleAdjustment
    # `OptimizerBirdview.cc:1040-1091`)
    def masks(state, sets):
        cam_R, cam_t, points = state
        out = []
        for kind, es in sets:
            if es is None:
                out.append(None)
            else:
                out.append(_classify(kind, cam_R, cam_t, points, es, intr))
        return out

    if reclassify:
        m_mono, m_stereo, m_bird = masks(state, msets)
        msets = [
            ("mono", mono._replace(valid=m_mono) if mono is not None else None),
            ("stereo", stereo._replace(valid=m_stereo) if stereo is not None else None),
            ("bird", bird._replace(valid=m_bird) if bird is not None else None),
        ]
    state, cost = run_phase(state, iters_phase2, True, msets)

    # final classification is against the ORIGINAL edge sets: an edge
    # excluded between phases re-qualifies if consistent with the final state
    m_mono, m_stereo, m_bird = masks(
        state, [("mono", mono), ("stereo", stereo), ("bird", bird)]
    )
    cam_R, cam_t, points = state
    empty = jnp.zeros((0,), bool)
    return BAResult(
        cam_R,
        cam_t,
        points,
        m_mono if m_mono is not None else empty,
        m_stereo if m_stereo is not None else empty,
        m_bird if m_bird is not None else empty,
        cost,
    )
