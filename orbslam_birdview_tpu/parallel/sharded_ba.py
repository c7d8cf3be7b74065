"""Distributed bundle adjustment over a device mesh.

The SLAM analogue of data/context parallelism (SURVEY §2.3/§5): landmarks
and their observation edges are partitioned into map blocks, one block per
device; cameras are replicated. Each device assembles its local Schur
contributions; the reduced camera system is summed over ICI with `psum`,
solved (replicated) on every device, and landmark updates are applied
locally — no landmark state ever crosses the interconnect.

This is the design the reference cannot express (single-process pthreads,
SURVEY §2.3): pod-scale maps with per-block Schur reduction over ICI.
The same code runs on a virtual CPU mesh (tests) and a real TPU slice.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import lie
from ..graph.ba import _edge_terms, _inv3x3, EdgeSet

AXIS = "map"


class ShardedBAProblem(NamedTuple):
    """Per-device-sharded BA problem. Leading axis of points/edges is the
    global (sharded) axis; edge.pt indexes the LOCAL point slice."""

    cam_R: jnp.ndarray      # (C,3,3) replicated
    cam_t: jnp.ndarray      # (C,3)   replicated
    cam_fixed: jnp.ndarray  # (C,)    replicated
    points: jnp.ndarray     # (P_total,3) sharded on axis 0
    pt_valid: jnp.ndarray   # (P_total,)
    edges: EdgeSet          # arrays (E_total,…) sharded on axis 0


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def _local_lm_step(cam_R, cam_t, cam_fixed, points, pt_valid, edges, intr,
                   lam, axis):
    """One damped GN step with the Schur reduction psum'd over `axis`."""
    C = cam_R.shape[0]
    Pn = points.shape[0]
    dtype = cam_R.dtype
    e, Jc, Jp, w, cost, _, _ = _edge_terms("mono", cam_R, cam_t, points,
                                           edges, intr, True)
    Hcc = jnp.zeros((C, 6, 6), dtype).at[edges.cam].add(
        jnp.einsum("nij,n,nik->njk", Jc, w, Jc))
    bc = jnp.zeros((C, 6), dtype).at[edges.cam].add(
        jnp.einsum("nij,n,ni->nj", Jc, w, e))
    Hpp = jnp.zeros((Pn, 3, 3), dtype).at[edges.pt].add(
        jnp.einsum("nij,n,nik->njk", Jp, w, Jp))
    bp = jnp.zeros((Pn, 3), dtype).at[edges.pt].add(
        jnp.einsum("nij,n,ni->nj", Jp, w, e))
    W = jnp.zeros((C, 6, Pn, 3), dtype).at[edges.cam, :, edges.pt, :].add(
        jnp.einsum("nij,n,nik->njk", Jc, w, Jp))

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (Pn, 3, 3))
    dHpp = jnp.where(pt_valid[:, None, None], Hpp + lam * jnp.eye(3, dtype=dtype)[None], eye3)
    bp = jnp.where(pt_valid[:, None], bp, 0.0)
    W = W * pt_valid[None, None, :, None].astype(dtype)
    Hpp_inv = _inv3x3(dHpp)
    W3 = W.reshape(C * 6, Pn, 3)
    Y = jnp.einsum("apk,pkl->apl", W3, Hpp_inv)
    S_local = -jnp.einsum("apk,bpk->ab", Y, W3)
    idx = jnp.arange(C)
    S_local = (S_local.reshape(C, 6, C, 6).at[idx, :, idx, :]
               .add(Hcc + lam * jnp.eye(6, dtype=dtype)[None])
               .reshape(C * 6, C * 6))
    rhs_local = bc.reshape(-1) - jnp.einsum("apk,pk->a", Y, bp)

    # ICI reduction: every device gets the full camera system
    S = jax.lax.psum(S_local, axis)
    rhs = jax.lax.psum(rhs_local, axis)
    cost_tot = jax.lax.psum(cost, axis)
    # correct double-counted diagonal damping (each device added lam*I on
    # its Hcc diag): subtract (n_dev−1) copies
    n_dev = jax.lax.psum(jnp.ones((), dtype), axis)
    S = S - (n_dev - 1.0) * lam * jnp.eye(C * 6, dtype=dtype)

    free6 = jnp.repeat(~cam_fixed, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = jnp.where(free6, rhs, 0.0)
    dxc = -jnp.linalg.solve(S, rhs)
    tmp = bp + jnp.einsum("apk,a->pk", W3, dxc)
    dxp = -jnp.einsum("pij,pj->pi", Hpp_inv, tmp)
    dxp = jnp.where(pt_valid[:, None], dxp, 0.0)
    return dxc.reshape(C, 6), dxp, cost_tot


def sharded_bundle_adjust(mesh: Mesh, prob: ShardedBAProblem,
                          fx, fy, cx, cy, n_iters: int = 10):
    """Run LM BA with landmarks+edges sharded over `mesh` axis 'map'.

    Returns (cam_R, cam_t, points, final_cost)."""
    intr = (fx, fy, cx, cy, 0.0)
    axis = mesh.axis_names[0]

    def step_all(cam_R, cam_t, cam_fixed, points, pt_valid, edges):
        def body(carry, _):
            cam_R, cam_t, points, lam = carry
            dxc, dxp, cost0 = _local_lm_step(
                cam_R, cam_t, cam_fixed, points, pt_valid, edges, intr,
                lam, axis)
            Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
            pn = points + dxp
            _, _, cost1 = _local_lm_step(
                Rn, tn, cam_fixed, pn, pt_valid, edges, intr, lam, axis)
            ok = (cost1 < cost0) & jnp.isfinite(cost1)
            cam_R = jnp.where(ok, Rn, cam_R)
            cam_t = jnp.where(ok, tn, cam_t)
            points = jnp.where(ok, pn, points)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-9, 1e8)
            return (cam_R, cam_t, points, lam), cost1

        (cam_R, cam_t, points, _), costs = jax.lax.scan(
            body, (cam_R, cam_t, points, jnp.asarray(1e-4, cam_R.dtype)),
            None, length=n_iters)
        return cam_R, cam_t, points, costs[-1]

    from jax import shard_map

    rep = P()
    sh = P(axis)
    f = shard_map(
        step_all, mesh=mesh,
        in_specs=(rep, rep, rep, sh, sh,
                  EdgeSet(sh, sh, sh, sh, sh)),
        out_specs=(rep, rep, sh, rep),
        check_vma=False,
    )
    return jax.jit(f)(prob.cam_R, prob.cam_t, prob.cam_fixed,
                      prob.points, prob.pt_valid, prob.edges)


def shard_problem(mesh: Mesh, cam_R, cam_t, cam_fixed, points, pt_valid,
                  edges: EdgeSet) -> ShardedBAProblem:
    """Place a host-assembled problem onto the mesh. Points and edges must
    already be grouped so edges of shard k reference points of shard k via
    LOCAL indices (caller partitions by point-id range)."""
    axis = mesh.axis_names[0]
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(axis))
    return ShardedBAProblem(
        jax.device_put(cam_R, rep),
        jax.device_put(cam_t, rep),
        jax.device_put(cam_fixed, rep),
        jax.device_put(points, sh),
        jax.device_put(pt_valid, sh),
        EdgeSet(*(jax.device_put(x, sh) for x in edges)),
    )
