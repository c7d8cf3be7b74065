"""SO3 / SE3 / Sim3 Lie-group operations, pure JAX.

Closed forms match the conventions used by the reference's g2o types
(`/root/reference/src/OdomG2oType.cc`, `Thirdparty/g2o/g2o/types/sim3.h`):
SE3 tangent is ordered [rho(3), phi(3)] (translation first), updates are
LEFT-multiplicative (T <- exp(xi) * T), matching VertexSE3Quat
(`/root/reference/include/OdomG2oType.h:20-35`).

Everything is float-dtype-polymorphic and batchable with vmap; all branches
are implemented with `jnp.where` on Taylor fallbacks so gradients are finite
at the identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so3 hat: (…,3) -> (…,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (…,3,3) -> (…,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2):
    """Return (A, B, C) = sin t/t, (1-cos t)/t^2, (t - sin t)/t^3 with Taylor
    fallbacks near zero. theta2 is t^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-14))
    small = theta2 < _EPS
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe ** 3))
    return A, B, C


def so3_exp(w):
    """Rodrigues: (…,3) -> (…,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R):
    """(…,3,3) -> (…,3). Quaternion-based log: stable at 0 and pi.

    w = 2 * atan2(|q_v|, q_w) * q_v / |q_v|, with the small-|q_v| limit
    2/q_w * q_v.
    """
    q = rot_to_quat(R)  # canonical sign, q_w >= 0 -> theta in [0, pi]
    qw = q[..., 0]
    qv = q[..., 1:]
    # every intermediate must be NaN-free for BOTH branches: reverse-mode
    # autodiff evaluates the untaken branch and 0*NaN = NaN (pose-graph
    # Jacobians differentiate through here at exactly-zero residuals)
    nv2 = jnp.sum(qv * qv, axis=-1)
    safe_nv = jnp.sqrt(jnp.maximum(nv2, 1e-14))
    theta = 2.0 * jnp.arctan2(safe_nv, qw)
    qw_safe = jnp.maximum(qw, 1e-7)
    general = theta / safe_nv
    taylor = 2.0 / qw_safe - 2.0 * nv2 / (3.0 * qw_safe ** 3)
    scale = jnp.where(nv2 > 1e-12, general, taylor)
    return scale[..., None] * qv


def so3_left_jacobian(w):
    """V such that exp([rho;phi]) has translation V @ rho."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def so3_left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-14))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    half = safe * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe * safe),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE3: represented as (R (…,3,3), t (…,3)). Tangent xi = [rho, phi].
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """(…,6) [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, p):
    """Transform points p (…,3) by (R,t)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R, t):
    """(R,t) -> 4x4 homogeneous matrix."""
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def se3_update_left(R, t, xi):
    """Left-multiplicative update T <- exp(xi) T — matches the reference's
    VertexSE3Quat::oplusImpl (`/root/reference/include/OdomG2oType.h:29-33`)."""
    dR, dt = se3_exp(xi)
    return se3_mul(dR, dt, R, t)


# ---------------------------------------------------------------------------
# Quaternion helpers (wxyz order).
# ---------------------------------------------------------------------------

def quat_to_rot(q):
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Shepperd's method, branch-free via selecting the max-stability case."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    c0, c1, c2, c3 = case0(), case1(), case2(), case3()
    use0 = tr > 0
    use1 = (m00 >= m11) & (m00 >= m22) & ~use0
    use2 = (m11 > m00) & (m11 >= m22) & ~use0
    q = jnp.where(
        use0[..., None], c0, jnp.where(use1[..., None], c1, jnp.where(use2[..., None], c2, c3))
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Sim3: (R, t, s). Used by loop closing (`src/Sim3Solver.cc`,
# `src/Optimizer.cc:781-1044`). Tangent: [rho(3), phi(3), sigma(1)].
# ---------------------------------------------------------------------------

def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t, sa * sb


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_exp(xi):
    """(…,7) [rho, phi, sigma] -> (R, t, s). Closed form of g2o sim3.h."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-14))
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    eps = 1e-6
    sigma_small = jnp.abs(sigma) < eps
    theta_small = theta < eps
    safe_sigma = jnp.where(sigma_small, jnp.ones_like(sigma), sigma)
    safe_theta = jnp.where(theta_small, jnp.ones_like(theta), theta)

    # coefficients of V = A*I + B*W + C*W2 (g2o sim3.h conventions)
    # case both small:
    A_ss = 1.0 + sigma / 2.0
    B_ss = jnp.zeros_like(sigma)
    C_ss = 1.0 / 6.0
    # sigma small, theta not:
    A_st = jnp.ones_like(sigma)
    B_st = (1.0 - jnp.cos(safe_theta)) / jnp.maximum(theta2, eps)
    C_st = (safe_theta - jnp.sin(safe_theta)) / jnp.maximum(theta2 * safe_theta, eps)
    # sigma not small, theta small:
    A_ts = (s - 1.0) / safe_sigma
    B_ts = (s * safe_sigma - s + 1.0) / jnp.maximum(safe_sigma * safe_sigma, eps)
    C_ts = ((s - 1.0) / safe_sigma - ((s * safe_sigma - s + 1.0)) / jnp.maximum(safe_sigma * safe_sigma, eps)) / jnp.maximum(theta2, eps)
    C_ts = jnp.where(theta_small, jnp.zeros_like(C_ts), C_ts)  # limit handled by A,B only
    # general:
    a = s * jnp.sin(safe_theta)
    b = s * jnp.cos(safe_theta)
    c = theta2 + safe_sigma * safe_sigma
    A_g = (s - 1.0) / safe_sigma
    B_g = (a * safe_sigma + (1.0 - b) * safe_theta) / jnp.maximum(safe_theta * c, eps)
    C_g = (A_g - ((b - 1.0) * safe_sigma + a * safe_theta) / jnp.maximum(c, eps)) / jnp.maximum(theta2, eps)

    A = jnp.where(sigma_small, jnp.where(theta_small, A_ss, A_st), jnp.where(theta_small, A_ts, A_g))
    B = jnp.where(sigma_small, jnp.where(theta_small, B_ss, B_st), jnp.where(theta_small, jnp.zeros_like(B_ts), B_g))
    C = jnp.where(sigma_small, jnp.where(theta_small, C_ss, C_st), jnp.where(theta_small, C_ts, C_g))
    V = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t, s


def sim3_log(R, t, s):
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Recover V from (phi, sigma) then rho = V^-1 t. Solve 3x3 instead of closed form.
    xi_tmp = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    _, _, _ = sim3_exp(xi_tmp)  # not needed; build V directly below

    # Rebuild V with the same coefficient logic by calling sim3_exp on basis vectors.
    def build_V(phi, sigma):
        e = jnp.eye(3, dtype=phi.dtype)
        cols = []
        for i in range(3):
            xi = jnp.concatenate([e[i], phi, sigma[None]], axis=-1)
            _, ti, _ = sim3_exp(xi)
            cols.append(ti)
        return jnp.stack(cols, axis=-1)

    if phi.ndim == 1:
        V = build_V(phi, sigma)
    else:
        V = jax.vmap(build_V)(phi.reshape(-1, 3), sigma.reshape(-1)).reshape(phi.shape[:-1] + (3, 3))
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
