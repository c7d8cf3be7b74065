"""Matrix-free bundle adjustment for large maps (implicit Schur + PCG).

`graph.ba.bundle_adjust` materializes the camera-landmark coupling W as a
dense (C,6,P,3) tensor — ideal for local-BA windows (C≤64, P≤16k) where it
turns the Schur product into one MXU matmul, but O(C·P) memory makes it
infeasible for full-map global BA at KITTI scale (C>10³ keyframes,
P>10⁵ landmarks ⇒ W would be tens of GB).

This module provides the same LM protocol (two phases, Huber, chi²
re-classification — mirroring `OptimizerBirdview.cc`
`GlobalBundleAdjustemntWithBirdview` `:24-297` and the 5+10 iteration local
protocol) with **O(E) memory**: the reduced camera system
S = Hcc − W·Hpp⁻¹·Wᵀ is never formed. Instead S·x is applied matrix-free
through edge-indexed gathers, per-edge 6×3 block products, and
segment-sums — the "Bundle Adjustment in the Large" (Agarwal et al., 2010)
iterative-Schur recipe, which maps cleanly onto the TPU's vector unit:

    (Wᵀx)_p = Σ_{e: pt_e=p} U_eᵀ x_{cam_e}        gather + segsum
    (S x)_c = (Hcc+λI)_c x_c − Σ_{e: cam_e=c} U_e G_{pt_e} (Wᵀx)_{pt_e}

with U_e = Jcᵀ w Jp (the per-edge coupling block) and G = (Hpp+λI)⁻¹
(block-diagonal 3×3, closed-form inverse). The camera system is solved by
preconditioned CG with the **exact block-Jacobi preconditioner of S**
(exact because a landmark is observed at most once per camera, so the
diagonal blocks of W·Hpp⁻¹·Wᵀ only receive same-edge terms):

    M_c = (Hcc+λI)_c − Σ_{e: cam_e=c} U_e G_{pt_e} U_eᵀ

Fixed cameras are handled by orthogonal projection (their components are
zeroed in every CG operand), frozen points by masking their G and edge
blocks — identical semantics to `ba._schur_solve`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import lie, linalg
from . import ba
from .ba import BAResult, EdgeSet, _cost_only, _edge_terms, _inv3x3

# per-edge block products lower to MXU dot_generals, which default to
# bf16 passes on TPU — not enough mantissa for normal equations / CG;
# force full f32 precision on every einsum in this module
_ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _edge_blocks(cam_R, cam_t, points, edge_sets, intr, use_huber):
    """Per-edge Schur blocks, concatenated across edge types.

    Returns (cams, pts, U, Acc, App, bc_e, bp_e, total_cost) where
    U (E,6,3) = Jcᵀ w Jp, Acc (E,6,6) = Jcᵀ w Jc, App (E,3,3) = Jpᵀ w Jp,
    bc_e (E,6) = Jcᵀ w e, bp_e (E,3) = Jpᵀ w e.
    """
    cams, pts, Us, Accs, Apps, bcs, bps = [], [], [], [], [], [], []
    total_cost = None
    for kind, es in edge_sets:
        if es is None:
            continue
        e, Jc, Jp, w, cost, _, _ = _edge_terms(
            kind, cam_R, cam_t, points, es, intr, use_huber)
        total_cost = cost if total_cost is None else total_cost + cost
        cams.append(es.cam)
        pts.append(es.pt)
        Us.append(ba._gram(Jc, w, Jp))
        Accs.append(ba._gram(Jc, w, Jc))
        Apps.append(ba._gram(Jp, w, Jp))
        bcs.append(ba._gramv(Jc, w, e))
        bps.append(ba._gramv(Jp, w, e))
    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0)
    if total_cost is None:
        raise ValueError("no edge sets")
    return (cat(cams), cat(pts), cat(Us), cat(Accs), cat(Apps), cat(bcs),
            cat(bps), total_cost)


def _implicit_schur_step(cam_R, cam_t, points, edge_sets, intr, use_huber,
                         lam, cam_free, pt_free, C, P, cg_iters):
    """One damped-GN step via matrix-free Schur + PCG.

    Returns (dxc (C,6), dxp (P,3), cost_before)."""
    dtype = cam_R.dtype
    cams, ptsi, U, Acc, App, bc_e, bp_e, cost0 = _edge_blocks(
        cam_R, cam_t, points, edge_sets, intr, use_huber)
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hcc = ba._damp(jnp.zeros((C, 6, 6), dtype).at[cams].add(Acc), lam)
    bc = jnp.zeros((C, 6), dtype).at[cams].add(bc_e)
    Hpp = ba._damp(jnp.zeros((P, 3, 3), dtype).at[ptsi].add(App), lam)
    bp = jnp.zeros((P, 3), dtype).at[ptsi].add(bp_e)
    # freeze invalid/unreferenced points (same semantics as ba._schur_solve)
    Hpp = jnp.where(pt_free[:, None, None], Hpp,
                    jnp.broadcast_to(eye3, (P, 3, 3)))
    bp = jnp.where(pt_free[:, None], bp, 0.0)
    U = U * pt_free[ptsi][:, None, None].astype(dtype)
    G = _inv3x3(Hpp)
    G_e = G[ptsi]  # (E,3,3)

    # all per-edge/per-block products below are broadcast multiply-reduce
    # (VPU, exact f32) — see ba._gram for why einsum is the wrong lowering
    def W_apply(y):  # (P,3) -> (C,6)
        ue = jnp.sum(U * y[ptsi][:, None, :], -1)
        return jnp.zeros((C, 6), dtype).at[cams].add(ue)

    def WT_apply(x):  # (C,6) -> (P,3)
        ve = jnp.sum(U * x[cams][:, :, None], 1)
        return jnp.zeros((P, 3), dtype).at[ptsi].add(ve)

    proj = lambda x: jnp.where(cam_free[:, None], x, 0.0)

    def S_apply(x):  # (C,6) -> (C,6), projected to free cameras
        x = proj(x)
        y = jnp.sum(G * WT_apply(x)[:, None, :], -1)
        Sx = jnp.sum(Hcc * x[:, None, :], -1) - W_apply(y)
        return proj(Sx)

    # exact block-Jacobi preconditioner of S
    T_e = jnp.sum(U[:, :, :, None] * G_e[:, None, :, :], 2)   # U·G (E,6,3)
    D_e = jnp.sum(T_e[:, :, None, :] * U[:, None, :, :], -1)  # U·G·Uᵀ (E,6,6)
    M = Hcc - jnp.zeros((C, 6, 6), dtype).at[cams].add(D_e)
    M = jnp.where(cam_free[:, None, None], M,
                  jnp.broadcast_to(eye6, (C, 6, 6)))
    Minv = _inv6x6(M)
    prec = lambda r: jnp.sum(Minv * r[:, None, :], -1)

    rhs = proj(bc - W_apply(jnp.sum(G * bp[:, None, :], -1)))

    # PCG with fixed trip count; updates masked once converged
    x0 = jnp.zeros((C, 6), dtype)
    r0 = rhs
    z0 = prec(r0)
    rz0 = jnp.sum(r0 * z0)
    eps = jnp.asarray(1e-20, dtype)
    rhs_norm2 = jnp.sum(rhs * rhs)
    tol2 = 1e-12 * rhs_norm2

    def cg_body(carry, _):
        x, r, p, rz = carry
        live = (jnp.sum(r * r) > tol2) & (rz > eps)
        Ap = S_apply(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(live & (pAp > eps), rz / jnp.maximum(pAp, eps), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(live, rz_new / jnp.maximum(rz, eps), 0.0)
        p = jnp.where(live, z + beta * p, p)
        return (x, r, p, jnp.where(live, rz_new, rz)), None

    (xs, _, _, _), _ = jax.lax.scan(
        cg_body, (x0, r0, z0, rz0), None, length=cg_iters)
    dxc = -xs
    tmp = bp + WT_apply(dxc)
    dxp = -jnp.sum(G * tmp[:, None, :], -1)
    dxp = jnp.where(pt_free[:, None], dxp, 0.0)
    return dxc, dxp, cost0


def _inv6x6(A):
    """Batched 6x6 inverse via blockwise (Schur) inversion on 3x3 blocks —
    avoids jnp.linalg.inv's LU path, keeps everything closed-form/batched."""
    A11 = A[..., :3, :3]
    A12 = A[..., :3, 3:]
    A21 = A[..., 3:, :3]
    A22 = A[..., 3:, 3:]
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    A11i = _inv3x3(A11)
    S = A22 - mm(mm(A21, A11i), A12)  # 3x3 Schur complement
    Si = _inv3x3(S)
    T = mm(A11i, A12)       # A11⁻¹ A12
    B21 = -mm(Si, mm(A21, A11i))
    B11 = A11i - mm(T, B21)
    B12 = -mm(T, Si)
    top = jnp.concatenate([B11, B12], -1)
    bot = jnp.concatenate([B21, Si], -1)
    return jnp.concatenate([top, bot], -2)


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "iters_phase1",
                     "iters_phase2", "reclassify", "cg_iters"),
)
@linalg.f32_matmul
def bundle_adjust_large(
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
    cg_iters: int = 48,
) -> BAResult:
    """Drop-in replacement for `ba.bundle_adjust` with O(E) memory.

    Same LM protocol (two Huber phases, chi² re-classification between
    them, final classification against the original edge sets); the inner
    linear solve is implicit-Schur PCG instead of a dense factorization.
    Use for full-map global BA; `ba.bundle_adjust` stays optimal for small
    local windows.
    """
    C = cam_R.shape[0]
    P = points.shape[0]
    dtype = cam_R.dtype
    intr = (fx, fy, cx, cy, bf)
    cam_free = cam_valid & ~cam_fixed
    referenced = jnp.zeros((P,), bool)
    for es in (mono, stereo, bird):
        if es is not None:
            referenced = referenced.at[es.pt].max(es.valid)
    pt_free = point_valid & referenced

    msets = [("mono", mono), ("stereo", stereo), ("bird", bird)]

    def run_phase(state, n_iters, use_huber, sets):
        cam_R, cam_t, points = state

        def body(carry, _):
            cam_R, cam_t, points, lam = carry
            dxc, dxp, cost0 = _implicit_schur_step(
                cam_R, cam_t, points, sets, intr, use_huber, lam,
                cam_free, pt_free, C, P, cg_iters)
            Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
            pn = points + dxp
            cost1 = _cost_only(Rn, tn, pn, sets, intr, use_huber)
            # gate on the STEP's finiteness too: a NaN pose fails the
            # z>0 depth check and silently drops its edges from cost1
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
            length=n_iters)
        return (cam_R, cam_t, points), costs[-1]

    def masks(state, sets):
        cam_R, cam_t, points = state
        return [None if es is None
                else ba._classify(kind, cam_R, cam_t, points, es, intr)
                for kind, es in sets]

    state = (cam_R, cam_t, points)
    state, _ = run_phase(state, iters_phase1, True, msets)
    if reclassify:
        m_mono, m_stereo, m_bird = masks(state, msets)
        msets = [
            ("mono", mono._replace(valid=m_mono) if mono is not None else None),
            ("stereo", stereo._replace(valid=m_stereo) if stereo is not None else None),
            ("bird", bird._replace(valid=m_bird) if bird is not None else None),
        ]
    state, cost = run_phase(state, iters_phase2, True, msets)

    m_mono, m_stereo, m_bird = masks(
        state, [("mono", mono), ("stereo", stereo), ("bird", bird)])
    cam_R, cam_t, points = state
    empty = jnp.zeros((0,), bool)
    return BAResult(
        cam_R, cam_t, points,
        m_mono if m_mono is not None else empty,
        m_stereo if m_stereo is not None else empty,
        m_bird if m_bird is not None else empty,
        cost,
    )
