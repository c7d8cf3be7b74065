"""A/B dense 96x96 SPD solve strategies on TPU (inside a scan, like BA)."""
import time

import numpy as np


def bench(f, args, n=64, rep=3):
    import jax

    def step(c, _):
        out = f(*args[:-1], c)
        return c + 1e-12 * out, None

    jf = jax.jit(lambda c: jax.lax.scan(step, c, None, length=n)[0])
    c0 = args[-1]
    out = jax.block_until_ready(jf(c0))
    t0 = time.perf_counter()
    for _ in range(rep):
        out = jf(c0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (rep * n)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    D = 96
    A = rng.normal(size=(D, D)).astype(np.float32)
    A = A @ A.T + D * np.eye(D, dtype=np.float32)
    b = rng.normal(size=(D,)).astype(np.float32)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)

    def lu_solve(A, b):
        return jnp.linalg.solve(A, b)

    def cho(A, b):
        L = jax.lax.linalg.cholesky(A)
        y = jax.lax.linalg.triangular_solve(L, b[:, None], left_side=True,
                                            lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                            transpose_a=True)
        return x[:, 0]

    def cg(A, b, iters=48):
        x = jnp.zeros_like(b)
        r = b
        p = r
        rz = jnp.dot(r, r)

        def body(carry, _):
            x, r, p, rz = carry
            Ap = A @ p
            alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            rz_new = jnp.dot(r, r)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = r + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
        return x

    for name, f in (("lu", lu_solve), ("chol", cho),
                    ("cg48", lambda A, b: cg(A, b, 48)),
                    ("cg24", lambda A, b: cg(A, b, 24))):
        t = bench(f, (Aj, bj))
        x = np.asarray(jax.jit(f)(Aj, bj))
        err = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
        print(f"{name:5s}: {t*1e3:7.3f} ms  rel-resid {err:.2e}")


if __name__ == "__main__":
    main()
