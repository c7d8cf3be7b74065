"""A/B the Schur-product layout on TPU: (…,P,3) lane-padded vs P-minor.

Hypothesis: tensors with a size-3 minor dim get padded 3->128 in lanes
(42x HBM waste); reshape(C6, P*3) additionally forces a relayout. Variants:
  v0: current — scatter W (C,6,P,3), reshape, broadcast-reduce Y, 2D dot.
  v1: no-reshape — multi-dim dot_general contracting (P,3) directly.
  v2: P-minor — scatter W as (C,6,3,P); Y_T broadcast-reduce with k in
      sublanes; multi-dim dot_general contracting (3,P).
Each scan-chains 64 iters with Wblk varying (no loop-invariant hoisting).
Usage: env PYTHONPATH="$PYTHONPATH:/root/repo" python tools/time_schur_layout.py
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

    rng = np.random.default_rng(0)
    C, P, E = 16, 4096, 16384
    HI = jax.lax.Precision.HIGHEST

    Wblk0 = jnp.asarray(rng.normal(0, 1, (E, 6, 3)).astype(np.float32))
    G0 = jnp.asarray(rng.normal(0, 1, (P, 3, 3)).astype(np.float32))
    bp0 = jnp.asarray(rng.normal(0, 1, (P, 3)).astype(np.float32))
    cams = jnp.asarray(rng.integers(0, C, E), jnp.int32)
    ptsi = jnp.asarray(rng.integers(0, P, E), jnp.int32)

    def v0(carry):
        Wblk, G, bp = carry
        W = jnp.zeros((C, 6, P, 3), jnp.float32).at[cams, :, ptsi, :].add(Wblk)
        W3 = W.reshape(C * 6, P, 3)
        Y = jnp.sum(W3[:, :, :, None] * G[None], axis=2)
        S = -jax.lax.dot_general(
            Y.reshape(C * 6, P * 3), W3.reshape(C * 6, P * 3),
            (((1,), (1,)), ((), ())), precision=HI)
        rhs = jnp.sum(Y * bp[None], axis=(1, 2))
        dxc = S[:, 0] * 1e-12 + rhs * 1e-12
        tmp = bp + jnp.sum(W3 * dxc[:, None, None], axis=0)
        return (Wblk + 1e-12 * tmp[0].sum(), G, bp)

    def v1(carry):
        Wblk, G, bp = carry
        W = jnp.zeros((C, 6, P, 3), jnp.float32).at[cams, :, ptsi, :].add(Wblk)
        W3 = W.reshape(C * 6, P, 3)
        Y = jnp.sum(W3[:, :, :, None] * G[None], axis=2)
        S = -jax.lax.dot_general(
            Y, W3, (((1, 2), (1, 2)), ((), ())), precision=HI)
        rhs = jnp.sum(Y * bp[None], axis=(1, 2))
        dxc = S[:, 0] * 1e-12 + rhs * 1e-12
        tmp = bp + jnp.sum(W3 * dxc[:, None, None], axis=0)
        return (Wblk + 1e-12 * tmp[0].sum(), G, bp)

    def v2(carry):
        Wblk, G, bp = carry
        # P-minor: W_T (C,6,3,P); scatter indexes dims 0 and 3
        W_T = jnp.zeros((C, 6, 3, P), jnp.float32).at[
            cams, :, :, ptsi].add(Wblk)
        W3T = W_T.reshape(C * 6, 3, P)
        G_T = jnp.transpose(G, (1, 2, 0))       # (3,3,P)
        bp_T = bp.T                              # (3,P)
        # Y_T[a,l,p] = sum_k W3T[a,k,p] * G_T[k,l,p]
        Y_T = jnp.sum(W3T[:, :, None, :] * G_T[None], axis=1)
        S = -jax.lax.dot_general(
            Y_T, W3T, (((1, 2), (1, 2)), ((), ())), precision=HI)
        rhs = jnp.sum(Y_T * bp_T[None], axis=(1, 2))
        dxc = S[:, 0] * 1e-12 + rhs * 1e-12
        tmp = bp_T + jnp.sum(W3T * dxc[:, None, None], axis=0)
        return (Wblk + 1e-12 * tmp[0].sum(), G, bp)

    carry = (Wblk0, G0, bp0)
    for name, f in [("v0 current (P,3)+reshape", v0),
                    ("v1 (P,3) multi-dim dot  ", v1),
                    ("v2 P-minor (3,P)        ", v2)]:
        t = bench_scan(f, carry)
        print(f"{name}: {t*1e3:7.3f} ms/iter")


if __name__ == "__main__":
    main()
