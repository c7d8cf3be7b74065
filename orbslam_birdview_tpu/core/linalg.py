"""Small dense linear algebra tuned for TPU.

`jnp.linalg.solve` lowers to LU with partial pivoting — a serial,
scalar-unit-bound path that costs ~50µs even for a 6×6 system and sits on
the critical path of every LM iteration (pose optimization runs 40 of them
per frame). For the tiny SPD systems of this engine (6×6 pose Hessians,
7×7 Sim3 Hessians, GN polish steps) an unrolled Cholesky is branch-free,
fully fusible elementwise code on the VPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Run `fn` (trace or eager) under full-f32 matmul precision.

    TPU dot_generals on f32 inputs default to single-pass bf16 per operand
    (~2⁻⁸ relative error). That is intentional and fast for the descriptor
    /image kernels in `frontend/` (their arrays are explicitly bf16/int8),
    but catastrophic for geometry: a bf16 R·X at X≈10 m is off by ~4 cm,
    which projects to ~1–2 px of residual error — inflating every chi²
    gate and wrecking BA/pose-LM convergence ON TPU while CPU runs (full
    f32) look fine. Decorate every geometry/solver entry point with this;
    the context is scoped, so frontend kernels keep their fast paths.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def solve_psd_small(A, b, eps: float = 1e-12):
    """Solve A x = b for symmetric positive-(semi)definite A of small static
    size n (n ≤ ~12). Batched over leading dimensions. Unrolled Cholesky +
    two triangular solves; ~n³/3 fused scalar ops, no pivoting, no host
    sync."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
