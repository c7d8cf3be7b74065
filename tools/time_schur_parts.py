"""Break down `_schur_solve` cost on TPU: inv+Y / S-build / solve / backsub.

Cumulative stages, each scan-chained with a data-dependent carry so the
tunnel dispatch RTT amortizes away (see time_ba_parts.py).
Usage: env PYTHONPATH="$PYTHONPATH:/root/repo" python tools/time_schur_parts.py
"""
import time

import numpy as np


def bench_scan(f, carry0, n=64, rep=3):
    import jax

    jf = jax.jit(lambda c: jax.lax.scan(lambda c, _: (f(c), None), c,
                                        None, length=n)[0])
    out = jax.block_until_ready(jf(carry0))
    t0 = time.perf_counter()
    for _ in range(rep):
        out = jf(carry0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (rep * n)


def main():
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.graph import ba

    rng = np.random.default_rng(0)
    C, P, E = 16, 4096, 16384
    FX = FY = 500.0
    CX, CY = 320.0, 240.0
    intr = (FX, FY, CX, CY, 0.0)

    cam_t = rng.normal(0, 0.5, (C, 3)).astype(np.float32)
    cam_R = np.broadcast_to(np.eye(3, dtype=np.float32), (C, 3, 3)).copy()
    pts = rng.uniform(-4, 4, (P, 3)).astype(np.float32)
    pts[:, 2] += 10.0
    e_cam = rng.integers(0, C, E)
    e_pt = rng.integers(0, P, E)
    Xc = pts[e_pt] + cam_t[e_cam]
    obs = np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX,
                    FY * Xc[:, 1] / Xc[:, 2] + CY], -1)
    obs += rng.normal(0, 1.0, obs.shape)
    mono = ba.EdgeSet(
        cam=jnp.asarray(e_cam, jnp.int32), pt=jnp.asarray(e_pt, jnp.int32),
        obs=jnp.asarray(obs.astype(np.float32)),
        info=jnp.ones(E, jnp.float32), valid=jnp.ones(E, bool))
    msets = [("mono", mono)]
    cam_free = jnp.ones(C, bool).at[0].set(False)
    pt_free = jnp.ones(P, bool)
    lam = 1e-4

    Hcc0, bc0, Hpp0, bp0, W0, _ = ba._assemble(
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(pts), msets,
        intr, True, C, P)
    dtype = Hcc0.dtype

    def stages(Hcc, bc, Hpp, bp, W, upto):
        dHcc = ba._damp(Hcc, lam)
        dHpp = ba._damp(Hpp, lam)
        eye3b = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (P, 3, 3))
        dHpp = jnp.where(pt_free[:, None, None], dHpp, eye3b)
        bp = jnp.where(pt_free[:, None], bp, 0.0)
        W = W * pt_free[None, None, :, None].astype(dtype)
        Hpp_inv = ba._inv3x3(dHpp)
        W3 = W.reshape(C * 6, P, 3)
        Y = jnp.sum(W3[:, :, :, None] * Hpp_inv[None], axis=2)
        if upto == 0:
            return Y[:, 0, :], Y[0, :, 0]
        S = jnp.zeros((C * 6, C * 6), dtype)
        idx = jnp.arange(C)
        S = S.reshape(C, 6, C, 6).at[idx, :, idx, :].add(dHcc).reshape(
            C * 6, C * 6)
        S = S - jax.lax.dot_general(
            Y.reshape(C * 6, P * 3), W3.reshape(C * 6, P * 3),
            (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST)
        rhs = bc.reshape(-1) - jnp.sum(Y * bp[None], axis=(1, 2))
        free6 = jnp.repeat(cam_free, 6)
        S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
        rhs = jnp.where(free6, rhs, 0.0)
        if upto == 1:
            return S[0], rhs
        dxc = -jnp.linalg.solve(S, rhs)
        if upto == 2:
            return dxc, rhs
        tmp = bp + jnp.sum(W3 * dxc[:, None, None], axis=0)
        dxp = -jnp.sum(Hpp_inv * tmp[:, None, :], axis=-1)
        return dxc, dxp[:, 0]

    def mk(upto):
        def step(carry):
            Hcc, bc, Hpp, bp, W = carry
            a, b = stages(Hcc, bc, Hpp, bp, W, upto)
            eps = 1e-12 * jnp.sum(a) + 1e-12 * jnp.sum(b)
            return (Hcc + eps, bc, Hpp, bp, W)
        return step

    carry = (Hcc0, bc0, Hpp0, bp0, W0)
    names = ["inv3x3+Y", "+S build", "+solve96", "+backsub"]
    prev = 0.0
    for upto in range(4):
        t = bench_scan(mk(upto), carry)
        print(f"{names[upto]:9s}: cum {t*1e3:7.3f} ms/iter  "
              f"(delta {(t-prev)*1e3:7.3f})")
        prev = t


if __name__ == "__main__":
    main()
