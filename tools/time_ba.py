"""Time local-BA `bundle_adjust` on the real TPU at pipeline-realistic sizes.

Usage: python tools/time_ba.py  (keep default axon env)
Subtracts the tunnel dispatch RTT measured on a trivial jitted op.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam_birdview_tpu.graph import ba

    rng = np.random.default_rng(0)
    C, P, E = 16, 4096, 16384
    FX = FY = 500.0
    CX, CY = 320.0, 240.0

    # synthetic but convergent geometry: cameras on an arc, points in front
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
        cam=jnp.asarray(e_cam, jnp.int32),
        pt=jnp.asarray(e_pt, jnp.int32),
        obs=jnp.asarray(obs.astype(np.float32)),
        info=jnp.ones(E, jnp.float32),
        valid=jnp.ones(E, bool),
    )
    cam_fixed = jnp.zeros(C, bool).at[0].set(True)
    args = dict(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=cam_fixed, cam_valid=jnp.ones(C, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(P, bool),
        mono=mono, stereo=None, bird=None,
        fx=FX, fy=FY, cx=CX, cy=CY,
    )

    # chain N BA solves inside ONE jitted scan (data-dependent carry) so the
    # tunnel dispatch RTT amortizes away, as bench.py does
    N = 8

    def chained(cam_R0, cam_t0, pts0):
        def body(carry, _):
            cR, ct, p = carry
            res = ba.bundle_adjust(
                cR, ct, args["cam_fixed"], args["cam_valid"], p,
                args["point_valid"], args["mono"], None, None,
                fx=FX, fy=FY, cx=CX, cy=CY)
            return (res.cam_R, res.cam_t, res.points), res.cost

        (_, _, _), costs = jax.lax.scan(
            body, (cam_R0, cam_t0, pts0), None, length=N)
        return costs

    f = jax.jit(chained)
    c = f(args["cam_R"], args["cam_t"], args["points"])
    c.block_until_ready()
    REP = 5
    t0 = time.perf_counter()
    for _ in range(REP):
        c = f(args["cam_R"], args["cam_t"], args["points"])
    c.block_until_ready()
    per_call = (time.perf_counter() - t0) / (REP * N)
    print(f"local BA C={C} P={P} E={E} (5+10 LM iters): "
          f"{per_call*1e3:.2f} ms/solve (scan-chained, RTT-amortized)")


if __name__ == "__main__":
    main()
