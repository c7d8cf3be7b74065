"""EPnP: Efficient Perspective-n-Point (Lepetit et al.), batched JAX.

The reference relocalizes with EPnP inside RANSAC (`/root/reference/src/
PnPsolver.cc`): 4 control points via PCA (`choose_control_points` `:375`),
barycentric coordinates (`:411`), the 2n x 12 M system (`:436-477`), β
solutions for N=1..3 with Gauss-Newton polish (`:667-1000`), pose via Horn
(`estimate_R_and_t` `:569`).

This implementation evaluates the N=1..3 β cases, polishes each with a few
Gauss-Newton steps on the 6-dim β-distance system, recovers (R, t) by
Procrustes, and keeps the lowest-reprojection solution — the same structure,
vectorized (every RANSAC hypothesis runs this under vmap). `pnp.pnp_ransac`
remains the default driver (DLT minimal + GN polish); `epnp` is the drop-in
single-shot solver used for all-inlier refinement and parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import linalg


def _control_points(Xw):
    """PCA control points: centroid + principal axes scaled by std."""
    c = jnp.mean(Xw, axis=0)
    Q = Xw - c
    cov = Q.T @ Q / Xw.shape[0]
    w, V = jnp.linalg.eigh(cov)  # ascending
    s = jnp.sqrt(jnp.maximum(w, 1e-12))
    cw = jnp.stack([
        c,
        c + s[2] * V[:, 2],
        c + s[1] * V[:, 1],
        c + s[0] * V[:, 0],
    ])
    return cw  # (4,3)


def _barycentric(Xw, cw):
    """alphas (n,4) with Xw = alphas @ cw."""
    B = (cw[1:] - cw[0]).T  # (3,3)
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3, dtype=Xw.dtype))
    a123 = (Xw - cw[0]) @ Binv.T
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_M(alphas, xy_norm):
    """(2n,12) system: for each point, rows over the 4 control points."""
    n = alphas.shape[0]
    u = xy_norm[:, 0:1]
    v = xy_norm[:, 1:2]
    # fx=fy=1, cx=cy=0 in normalized coords
    row_u = jnp.concatenate(
        [alphas[:, j : j + 1] * jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 1)), -u], 1)
         for j in range(4)], axis=1)  # (n,12)
    row_v = jnp.concatenate(
        [alphas[:, j : j + 1] * jnp.concatenate(
            [jnp.zeros((n, 1)), jnp.ones((n, 1)), -v], 1)
         for j in range(4)], axis=1)
    return jnp.concatenate([row_u, row_v], axis=0)  # (2n,12)


def _rho(cw):
    """Squared distances between the 6 control-point pairs."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack([jnp.sum((cw[a] - cw[b]) ** 2) for a, b in pairs])


def _L_matrix(V):
    """V: (12,4) last four right-singular vectors (columns, ascending order
    v1..v4 smallest first). L (6,10) for betas ordered
    [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44]."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    vs = [V[:, k].reshape(4, 3) for k in range(4)]
    rows = []
    for a, b in pairs:
        dv = [v[a] - v[b] for v in vs]
        row = []
        for i in range(4):
            for j in range(i, 4):
                coef = jnp.dot(dv[i], dv[j])
                row.append(coef if i == j else 2.0 * coef)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)  # (6,10) order [11,12,13,14,22,23,24,33,34,44]


_BETA_IDX = {  # index of beta_ij in the 10-vector (i<=j)
    (0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3, (1, 1): 4, (1, 2): 5,
    (1, 3): 6, (2, 2): 7, (2, 3): 8, (3, 3): 9,
}




def _gn_betas(L, rho, betas, iters: int = 5):
    def step(b, _):
        def f(bb):
            return L @ _b10_quad(bb) - rho

        J = jax.jacfwd(f)(b)
        r = f(b)
        H = J.T @ J + 1e-9 * jnp.eye(4, dtype=b.dtype)
        db = -jnp.linalg.solve(H, J.T @ r)
        return b + db, None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _b10_quad(b):
    """β → 10-vector of products β_iβ_j (i≤j). The pair factor 2 for i≠j
    lives in `_L_matrix`'s columns, NOT here — applying it in both places
    quadruples the cross terms (caught by the 4-point minimal-set test)."""
    out = []
    for i in range(4):
        for j in range(i, 4):
            out.append(b[i] * b[j])
    return jnp.stack(out)


def _procrustes(pw, pc):
    """Rigid (R,t): pc ≈ R pw + t (Horn / Kabsch)."""
    cw = jnp.mean(pw, 0)
    cc = jnp.mean(pc, 0)
    H = (pw - cw).T @ (pc - cc)
    U, _, Vh = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vh.T @ U.T)
    S = jnp.diag(jnp.array([1.0, 1.0, d]))
    R = Vh.T @ S @ U.T
    t = cc - R @ cw
    return R, t


@linalg.f32_matmul
def epnp(Xw, xy_norm, valid=None):
    """Single-shot EPnP on k>=4 correspondences.

    Xw (k,3) world points, xy_norm (k,2) normalized image coords; returns
    (R, t) with the lowest mean squared reprojection error among the β
    cases."""
    if valid is not None:
        w = valid.astype(Xw.dtype)[:, None]
        # re-weight by duplicating centroid behaviour: zero-weight rows are
        # replaced by the weighted centroid so they do not affect the fit
        cm = jnp.sum(Xw * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
        um = jnp.sum(xy_norm * w[:, :1] * 0 + xy_norm * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
        Xw = jnp.where(w > 0, Xw, cm)
        xy_norm = jnp.where(w > 0, xy_norm, um)
    cw = _control_points(Xw)
    alphas = _barycentric(Xw, cw)
    M = _build_M(alphas, xy_norm)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)  # ascending: first 4 columns = null-ish
    V = vecs[:, :4]  # (12,4) v1..v4 (smallest eigenvalues first)
    L = _L_matrix(V)
    rho = _rho(cw)

    def solve_case(init_betas):
        betas = _gn_betas(L, rho, init_betas)
        ccam = (V @ betas).reshape(4, 3)
        pc = alphas @ ccam
        # cheirality: flip the whole solution if depths come out negative
        sign = jnp.where(jnp.mean(pc[:, 2]) < 0, -1.0, 1.0)
        pc = pc * sign
        R, t = _procrustes(Xw, pc)
        Xc = Xw @ R.T + t
        z = jnp.maximum(Xc[:, 2], 1e-6)
        proj = Xc[:, :2] / z[:, None]
        err = jnp.mean(jnp.sum((proj - xy_norm) ** 2, 1))
        return err, R, t

    # β case seeds via constrained least squares on L·b10 = rho, exactly
    # the reference's compute_betas_approx_{1,2,3}
    # (`src/PnPsolver.cc:591-666`). L column order here is
    # [b11,b12,b13,b14,b22,b23,b24,b33,b34,b44].
    def lsq(cols):
        A = L[:, jnp.asarray(cols)]
        AtA = A.T @ A + 1e-10 * jnp.eye(len(cols), dtype=L.dtype)
        return jnp.linalg.solve(AtA, A.T @ rho)

    sqrt_abs = lambda x: jnp.sqrt(jnp.abs(x))
    # N=1: columns b11,b12,b13,b14 → β1=√b11, βk=b1k/β1
    b = lsq([0, 1, 2, 3])
    b1 = sqrt_abs(b[0])
    case1 = jnp.stack([b1, b[1] / jnp.maximum(b1, 1e-12),
                       b[2] / jnp.maximum(b1, 1e-12),
                       b[3] / jnp.maximum(b1, 1e-12)])
    # N=2: columns b11,b12,b22
    b = lsq([0, 1, 4])
    b1 = sqrt_abs(b[0])
    b2 = sqrt_abs(b[2]) * jnp.sign(b[1]) * jnp.sign(b[0])
    case2 = jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])
    # N=3: columns b11,b12,b22,b13,b23
    b = lsq([0, 1, 4, 2, 5])
    b1 = sqrt_abs(b[0])
    b2 = sqrt_abs(b[2]) * jnp.sign(b[1]) * jnp.sign(b[0])
    b3 = b[3] / jnp.maximum(b1, 1e-12)
    case3 = jnp.stack([b1, b2, b3, jnp.zeros(())])
    cases = [case1, case2, case3]
    errs, Rs, ts = [], [], []
    for c in cases:
        e, R, t = solve_case(c.astype(Xw.dtype))
        errs.append(e)
        Rs.append(R)
        ts.append(t)
    errs = jnp.stack(errs)
    best = jnp.argmin(errs)
    return jnp.stack(Rs)[best], jnp.stack(ts)[best]
