"""Break down local-BA iteration cost on TPU: assemble / schur / cost-only.

Usage: env PYTHONPATH="$PYTHONPATH:/root/repo" python tools/time_ba_parts.py
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
    cam_Rj = jnp.asarray(cam_R)
    cam_tj = jnp.asarray(cam_t)
    ptsj = jnp.asarray(pts)
    cam_free = jnp.ones(C, bool).at[0].set(False)
    pt_free = jnp.ones(P, bool)

    def step_assemble(carry):
        cR, ct, p = carry
        Hcc, bc, Hpp, bp, W, cost = ba._assemble(cR, ct, p, msets, intr,
                                                 True, C, P)
        return (cR, ct + 1e-12 * bc[0, :3] * cost, p + 1e-12 * bp)

    def step_full(carry):
        cR, ct, p = carry
        Hcc, bc, Hpp, bp, W, cost = ba._assemble(cR, ct, p, msets, intr,
                                                 True, C, P)
        dxc, dxp = ba._schur_solve(Hcc, bc, Hpp, bp, W, 1e-4, cam_free,
                                   pt_free, C, P)
        return (cR, ct + 1e-12 * dxc[:, :3], p + 1e-12 * dxp)

    def step_cost(carry):
        cR, ct, p = carry
        c = ba._cost_only(cR, ct, p, msets, intr, True)
        return (cR, ct + 1e-12 * c, p)

    carry = (cam_Rj, cam_tj, ptsj)
    t_asm = bench_scan(step_assemble, carry)
    t_full = bench_scan(step_full, carry)
    t_cost = bench_scan(step_cost, carry)
    print(f"assemble-only      : {t_asm*1e3:7.3f} ms/iter")
    print(f"assemble+schur     : {t_full*1e3:7.3f} ms/iter")
    print(f"  -> schur part    : {(t_full-t_asm)*1e3:7.3f} ms/iter")
    print(f"cost-only          : {t_cost*1e3:7.3f} ms/iter")
    print(f"LM iter total est  : {(t_full+t_cost)*1e3:7.3f} ms "
          f"(x15 iters = {(t_full+t_cost)*15e3:6.1f} ms)")


if __name__ == "__main__":
    main()
