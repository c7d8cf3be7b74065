"""Batched RANSAC utilities.

The reference runs RANSAC serially (200 iterations picking 8-point sets,
`/root/reference/src/Initializer.cc:100-127`; similar drivers in
`IcpSolver.cc`, `PnPsolver.cc`, `Sim3Solver.cc`). On TPU all hypotheses are
generated and scored in one shot: sample (NH, k) index sets from the valid
matches, vmap the minimal solver, score every hypothesis against every
correspondence as one (NH, N) tensor, argmax.

Determinism comes from explicit `jax.random` keys (the reference seeds
DUtils::Random with 0 for the same reason, `src/IcpSolver.cc:110`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key, valid, n_hyp: int, k: int):
    """Sample (n_hyp, k) indices uniformly from the True entries of `valid`.

    Fixed-shape: entries are drawn from the compacted valid prefix; if fewer
    than k valid items exist the hypothesis is marked invalid.
    Within-set duplicates are possible but vanishingly rare for n >> k; the
    affected hypothesis simply scores as degenerate and loses the argmax.
    """
    n = valid.shape[0]
    order = jnp.argsort(~valid)  # valid-first, stable
    n_valid = jnp.sum(valid.astype(jnp.int32))
    u = jax.random.randint(key, (n_hyp, k), 0, jnp.iinfo(jnp.int32).max)
    idx_in_valid = u % jnp.maximum(n_valid, 1)
    idx = order[idx_in_valid]
    ok = n_valid >= k
    return idx, jnp.broadcast_to(ok, (n_hyp,))


def best_hypothesis(scores, hyp_valid):
    """argmax over hypotheses with invalid ones suppressed."""
    s = jnp.where(hyp_valid, scores, -jnp.inf)
    best = jnp.argmax(s)
    return best, s[best]
