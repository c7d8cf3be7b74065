"""Fused Pallas kernel for motion-only pose LM.

`optimize_pose` is one XLA program, but its 4×10 LM iterations are a chain
of ~40 sequential micro-steps, each a burst of tiny VPU/MXU ops whose fixed
pipeline overhead dominates (measured ~36 µs/iteration, 1.45 ms/frame —
the single largest slice of the tracking step after the front-end). This
kernel runs the ENTIRE optimizer — all rounds, the damped-LM while loops,
Huber reweighting, chi² reclassification — inside one Pallas program, so an
iteration costs only its actual arithmetic (everything lives in VMEM; the
largest tensor is the (7, 2N) stacked normal-equation block).

The math is shared with graph/pose_opt.py — the kernel body calls the same
pure-jnp helpers (`_build_normal_eq`, `_eval_cost`, `_chi2_only`,
`lie.se3_update_left`, `linalg.solve_psd_small`), so the two paths cannot
drift apart. Reference semantics: `Optimizer::PoseOptimizationWithBirdview`
(`/root/reference/src/OptimizerBirdview.cc:299-702`).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import lie, linalg
from . import pose_opt as po


def _mm3(A, B):
    """3x3 @ 3x3 as broadcast+reduce: Mosaic rejects tiny dot_generals
    ('only constant accumulators supported')."""
    return jnp.sum(A[:, :, None] * B[None, :, :], axis=1)


def _mv3(A, v):
    return jnp.sum(A * v[None, :], axis=1)


def _se3_update_left(R, t, xi):
    """exp(xi) ∘ (R, t) with all 3x3/3-vector products elementwise —
    numerically identical to lie.se3_update_left (same coefficient
    formulas, same operation order per entry)."""
    rho, phi = xi[:3], xi[3:]
    theta2 = jnp.sum(phi * phi)
    A, B, C = lie._sinc_terms(theta2)
    W = lie.hat(phi)
    W2 = _mm3(W, W)
    I = jnp.eye(3, dtype=R.dtype)
    dR = I + A * W + B * W2
    V = I + B * W + C * W2
    dt = _mv3(V, rho)
    return _mm3(dR, R), _mv3(dR, t) + dt


def _kernel(Xw, obs, info, valid, Xb, obsb, infob, validb, R0, t0,
            R_out, t_out, inl_out, inlb_out, n_out, cost_out,
            *, fx, fy, cx, cy, rounds, iters_per_round):
    dtype = R0.dtype
    R = R0[:]
    t = t0[:]
    Xw_ = Xw[:]
    obs_ = obs[:]
    info_ = info[:]
    valid_ = valid[:] != 0
    Xb_ = Xb[:]
    obsb_ = obsb[:]
    infob_ = infob[:]
    validb_ = validb[:] != 0

    def lm_iters(R, t, active, active_b, use_huber):
        def cond(carry):
            _, _, _, it, done, _ = carry
            return (it < iters_per_round) & ~done

        def body(carry):
            R, t, lam, it, _, _ = carry
            H, g, cost0, _, _ = po._build_normal_eq(
                R, t, Xw_, obs_, info_, active, fx, fy, cx, cy,
                Xb_, obsb_, infob_, active_b, use_huber)
            eye = jnp.eye(6, dtype=dtype)
            Haug = H + lam * (H * eye) + 1e-10 * eye
            dx = -linalg.solve_psd_small(Haug, g)
            Rn, tn = _se3_update_left(R, t, dx)
            cost1 = po._eval_cost(
                Rn, tn, Xw_, obs_, info_, active, fx, fy, cx, cy,
                Xb_, obsb_, infob_, active_b, use_huber)
            accept = (cost1 < cost0) & jnp.all(jnp.isfinite(dx))
            R = jnp.where(accept, Rn, R)
            t = jnp.where(accept, tn, t)
            lam_n = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            done = (accept & (jnp.max(jnp.abs(dx)) < 1e-6)) | (lam_n > 1e5)
            cost = jnp.where(accept, cost1, cost0)
            return (R, t, lam_n, it + 1, done, cost)

        R, t, _, _, _, cost = jax.lax.while_loop(
            cond, body,
            (R, t, jnp.asarray(1e-4, dtype), jnp.int32(0), jnp.asarray(False),
             jnp.asarray(jnp.inf, dtype)))
        return R, t, cost

    active = valid_
    active_b = validb_
    cost = jnp.asarray(0.0, dtype)
    for rnd in range(rounds):
        use_huber = rnd < 2
        R, t, cost = lm_iters(R, t, active, active_b, use_huber)
        chi2, chi2_b = po._chi2_only(R, t, Xw_, obs_, info_, fx, fy, cx, cy,
                                     Xb_, obsb_, infob_)
        active = valid_ & (chi2 <= po.CHI2_MONO)
        active_b = validb_ & (chi2_b <= po.CHI2_BIRD)

    R_out[:] = R
    t_out[:] = t
    inl_out[:] = active.astype(jnp.int32)
    inlb_out[:] = active_b.astype(jnp.int32)
    n = jnp.sum(active.astype(jnp.int32)) + jnp.sum(active_b.astype(jnp.int32))
    n_out[:] = n.reshape(1)          # vector stores: Mosaic rejects scalar
    cost_out[:] = cost.reshape(1)    # stores to VMEM


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "rounds", "iters_per_round",
                     "interpret"),
)
def optimize_pose_fused(R0, t0, Xw, obs_uv, info, valid,
                        fx, fy, cx, cy,
                        Xw_bird=None, obs_pc_bird=None, info_bird=None,
                        valid_bird=None, rounds: int = 4,
                        iters_per_round: int = 10, interpret: bool = False):
    """Drop-in for pose_opt.optimize_pose running as one Pallas program."""
    dtype = R0.dtype
    if Xw_bird is None:
        Xw_bird = jnp.zeros((8, 3), dtype)
        obs_pc_bird = jnp.zeros((8, 3), dtype)
        info_bird = jnp.zeros((8,), dtype)
        valid_bird = jnp.zeros((8,), bool)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, fx=fx, fy=fy, cx=cx, cy=cy, rounds=rounds,
                          iters_per_round=iters_per_round),
        out_shape=(
            jax.ShapeDtypeStruct((3, 3), dtype),
            jax.ShapeDtypeStruct((3,), dtype),
            jax.ShapeDtypeStruct(valid.shape, jnp.int32),
            jax.ShapeDtypeStruct(valid_bird.shape, jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        in_specs=[vm] * 10,
        out_specs=(vm, vm, vm, vm, vm, vm),
        interpret=interpret,
    )(Xw, obs_uv, info, valid.astype(jnp.int32),
      Xw_bird, obs_pc_bird, info_bird, valid_bird.astype(jnp.int32),
      R0, t0)
    R, t, inl, inlb, n, cost = out
    return po.PoseOptResult(R, t, inl != 0, inlb != 0, n[0], cost[0])


@functools.lru_cache(maxsize=1)
def pallas_pose_enabled() -> bool:
    env = os.environ.get("OSB_PALLAS_POSE", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
