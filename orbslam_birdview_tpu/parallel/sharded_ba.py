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

from ..core import lie, linalg
from ..graph.ba import _damp, _edge_terms, _gram, _gramv, _inv3x3, EdgeSet

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
    Hcc = jnp.zeros((C, 6, 6), dtype).at[edges.cam].add(_gram(Jc, w, Jc))
    bc = jnp.zeros((C, 6), dtype).at[edges.cam].add(_gramv(Jc, w, e))
    Hpp = jnp.zeros((Pn, 3, 3), dtype).at[edges.pt].add(_gram(Jp, w, Jp))
    bp = jnp.zeros((Pn, 3), dtype).at[edges.pt].add(_gramv(Jp, w, e))
    W = jnp.zeros((C, 6, Pn, 3), dtype).at[edges.cam, :, edges.pt, :].add(
        _gram(Jc, w, Jp))

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (Pn, 3, 3))
    dHpp = jnp.where(pt_valid[:, None, None], _damp(Hpp, lam), eye3)
    bp = jnp.where(pt_valid[:, None], bp, 0.0)
    W = W * pt_valid[None, None, :, None].astype(dtype)
    Hpp_inv = _inv3x3(dHpp)
    W3 = W.reshape(C * 6, Pn, 3)
    Y = jnp.sum(W3[:, :, :, None] * Hpp_inv[None], axis=2)
    # multi-dim contraction over (Pn,3) directly — reshaping to (C6,Pn*3)
    # forces a physical relayout of the lane-padded minor-3 operands
    # (see graph/ba.py _schur_solve; tools/time_schur_layout.py)
    S_local = -jax.lax.dot_general(
        Y, W3, (((1, 2), (1, 2)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    idx = jnp.arange(C)
    # Marquardt damping on the shard-local Hcc: diag is additive across
    # shards, so Σ_shards λ·diag(Hcc_local) = λ·diag(Hcc_global) exactly —
    # no double-count correction needed (the λ·floor term for cameras
    # with no local edges sums to a negligible n_dev·λ·1e-6)
    S_local = (S_local.reshape(C, 6, C, 6).at[idx, :, idx, :]
               .add(_damp(Hcc, lam))
               .reshape(C * 6, C * 6))
    rhs_local = bc.reshape(-1) - jnp.sum(Y * bp[None], axis=(1, 2))

    # ICI reduction: every device gets the full camera system
    S = jax.lax.psum(S_local, axis)
    rhs = jax.lax.psum(rhs_local, axis)
    cost_tot = jax.lax.psum(cost, axis)

    free6 = jnp.repeat(~cam_fixed, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = jnp.where(free6, rhs, 0.0)
    dxc = -jnp.linalg.solve(S, rhs)
    tmp = bp + jnp.sum(W3 * dxc[:, None, None], axis=0)
    dxp = -jnp.sum(Hpp_inv * tmp[:, None, :], axis=-1)
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
            # step-finiteness gate; dxp is shard-local, so reduce the
            # verdict over the mesh axis to keep `ok` shard-consistent
            bad_p = jax.lax.psum(
                jnp.sum(~jnp.isfinite(dxp), dtype=jnp.int32), axis)
            ok = ((cost1 < cost0) & jnp.isfinite(cost1)
                  & jnp.all(jnp.isfinite(dxc)) & (bad_p == 0))
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
    return jax.jit(linalg.f32_matmul(f))(prob.cam_R, prob.cam_t, prob.cam_fixed,
                      prob.points, prob.pt_valid, prob.edges)


def _local_implicit_step(cam_R, cam_t, cam_free, points, pt_free, edge_sets,
                         intr, lam, axis, cg_iters, use_huber=True):
    """One damped-GN step, matrix-free Schur + PCG, map-sharded, over an
    arbitrary list of typed edge sets (mono + stereo + bird — the fork's
    full birdview fusion survives distribution, unlike round 1's
    mono-only path; reference semantics `OptimizerBirdview.cc:175-231`).

    Points/edges are shard-local (edges.pt index the local point slice);
    cameras are replicated. Each CG matvec costs ONE psum of a (C,6)
    vector over ICI — the only cross-device traffic. Combines
    `ba_large._implicit_schur_step` (O(E) memory) with the map-block
    partitioning above: per-device memory is O(E/n_dev), so pod-scale maps
    fit where even the single-chip implicit path would not.
    """
    from ..graph import ba_large

    C = cam_R.shape[0]
    Pn = points.shape[0]
    dtype = cam_R.dtype
    cams, ptsi, U, Acc, App, bc_e, bp_e, cost_loc = ba_large._edge_blocks(
        cam_R, cam_t, points, edge_sets, intr, use_huber)
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    # camera system: reduced over shards; damping added AFTER the psum
    Hcc = _damp(jax.lax.psum(
        jnp.zeros((C, 6, 6), dtype).at[cams].add(Acc), axis), lam)
    bc = jax.lax.psum(jnp.zeros((C, 6), dtype).at[cams].add(bc_e), axis)
    # point system: purely shard-local
    Hpp = _damp(jnp.zeros((Pn, 3, 3), dtype).at[ptsi].add(App), lam)
    bp = jnp.zeros((Pn, 3), dtype).at[ptsi].add(bp_e)
    Hpp = jnp.where(pt_free[:, None, None], Hpp,
                    jnp.broadcast_to(eye3, (Pn, 3, 3)))
    bp = jnp.where(pt_free[:, None], bp, 0.0)
    U = U * pt_free[ptsi][:, None, None].astype(dtype)
    G = _inv3x3(Hpp)

    def W_apply(y):  # local (Pn,3) -> replicated (C,6)
        ue = jnp.sum(U * y[ptsi][:, None, :], -1)
        return jax.lax.psum(jnp.zeros((C, 6), dtype).at[cams].add(ue), axis)

    def WT_apply(x):  # replicated (C,6) -> local (Pn,3)
        ve = jnp.sum(U * x[cams][:, :, None], 1)
        return jnp.zeros((Pn, 3), dtype).at[ptsi].add(ve)

    proj = lambda x: jnp.where(cam_free[:, None], x, 0.0)

    def S_apply(x):
        x = proj(x)
        y = jnp.sum(G * WT_apply(x)[:, None, :], -1)
        return proj(jnp.sum(Hcc * x[:, None, :], -1) - W_apply(y))

    G_e = G[ptsi]
    T_e = jnp.sum(U[:, :, :, None] * G_e[:, None, :, :], 2)
    D_e = jnp.sum(T_e[:, :, None, :] * U[:, None, :, :], -1)
    M = Hcc - jax.lax.psum(
        jnp.zeros((C, 6, 6), dtype).at[cams].add(D_e), axis)
    M = jnp.where(cam_free[:, None, None], M,
                  jnp.broadcast_to(eye6, (C, 6, 6)))
    Minv = ba_large._inv6x6(M)
    prec = lambda r: jnp.sum(Minv * r[:, None, :], -1)

    rhs = proj(bc - W_apply(jnp.sum(G * bp[:, None, :], -1)))
    x0 = jnp.zeros((C, 6), dtype)
    z0 = prec(rhs)
    rz0 = jnp.sum(rhs * z0)
    eps = jnp.asarray(1e-20, dtype)
    tol2 = 1e-12 * jnp.sum(rhs * rhs)

    def cg_body(carry, _):
        x, r, p, rz = carry
        live = (jnp.sum(r * r) > tol2) & (rz > eps)
        Ap = S_apply(p)  # one psum over ICI
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(live & (pAp > eps), rz / jnp.maximum(pAp, eps), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(live, rz_new / jnp.maximum(rz, eps), 0.0)
        p = jnp.where(live, z + beta * p, p)
        return (x, r, p, jnp.where(live, rz_new, rz)), None

    (xs, _, _, _), _ = jax.lax.scan(cg_body, (x0, rhs, z0, rz0), None,
                                    length=cg_iters)
    dxc = -xs
    dxp = -jnp.sum(G * (bp + WT_apply(dxc))[:, None, :], -1)
    dxp = jnp.where(pt_free[:, None], dxp, 0.0)
    return dxc, dxp, jax.lax.psum(cost_loc, axis)


def _local_cost(cam_R, cam_t, points, edge_sets, intr, axis,
                use_huber=True):
    from ..graph.ba import _cost_only

    return jax.lax.psum(
        _cost_only(cam_R, cam_t, points, edge_sets, intr, use_huber), axis)


def sharded_bundle_adjust_large(mesh: Mesh, prob: ShardedBAProblem,
                                fx, fy, cx, cy, n_iters: int = 10,
                                cg_iters: int = 48):
    """Matrix-free LM BA with landmarks+edges sharded over `mesh`.

    Same partitioning contract as `sharded_bundle_adjust`, but the reduced
    camera system is solved by PCG instead of a dense factorization —
    per-device memory O(E/n_dev), cross-device traffic one (C,6) psum per
    CG iteration. Returns (cam_R, cam_t, points, final_cost)."""
    intr = (fx, fy, cx, cy, 0.0)
    axis = mesh.axis_names[0]

    def step_all(cam_R, cam_t, cam_fixed, points, pt_valid, edges):
        def body(carry, _):
            cam_R, cam_t, points, lam = carry
            dxc, dxp, cost0 = _local_implicit_step(
                cam_R, cam_t, ~cam_fixed, points, pt_valid,
                [("mono", edges)], intr, lam, axis, cg_iters)
            Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
            pn = points + dxp
            cost1 = _local_cost(Rn, tn, pn, [("mono", edges)], intr, axis)
            # step-finiteness gate; dxp is shard-local, so reduce the
            # verdict over the mesh axis to keep `ok` shard-consistent
            bad_p = jax.lax.psum(
                jnp.sum(~jnp.isfinite(dxp), dtype=jnp.int32), axis)
            ok = ((cost1 < cost0) & jnp.isfinite(cost1)
                  & jnp.all(jnp.isfinite(dxc)) & (bad_p == 0))
            cam_R = jnp.where(ok, Rn, cam_R)
            cam_t = jnp.where(ok, tn, cam_t)
            points = jnp.where(ok, pn, points)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-9, 1e8)
            return (cam_R, cam_t, points, lam), jnp.where(ok, cost1, cost0)

        (cam_R, cam_t, points, _), costs = jax.lax.scan(
            body, (cam_R, cam_t, points, jnp.asarray(1e-4, cam_R.dtype)),
            None, length=n_iters)
        return cam_R, cam_t, points, costs[-1]

    from jax import shard_map

    rep = P()
    sh = P(axis)
    f = shard_map(
        step_all, mesh=mesh,
        in_specs=(rep, rep, rep, sh, sh, EdgeSet(sh, sh, sh, sh, sh)),
        out_specs=(rep, rep, sh, rep),
        check_vma=False,
    )
    return jax.jit(linalg.f32_matmul(f))(prob.cam_R, prob.cam_t, prob.cam_fixed,
                      prob.points, prob.pt_valid, prob.edges)


def sharded_global_ba(mesh: Mesh, cam_R, cam_t, cam_fixed, cam_valid,
                      points, pt_valid, mono, stereo, bird,
                      fx, fy, cx, cy, bf: float = 0.0,
                      iters_phase1: int = 5, iters_phase2: int = 10,
                      reclassify: bool = True, cg_iters: int = 48):
    """Full-protocol distributed global BA over ALL edge types.

    The sharded counterpart of `ba_large.bundle_adjust_large`: same LM
    protocol (two Huber phases, chi² re-classification between them, final
    inlier masks against the original edge sets), landmarks + edges
    partitioned into map blocks over the mesh. Mono + stereo + bird edges
    all participate — the fork's signature birdview fusion
    (`OptimizerBirdview.cc:24-297`) runs distributed, a capability the
    reference's single-process design cannot express.

    Inputs: cameras replicated; points/pt_valid sharded on axis 0; each
    EdgeSet (or None) sharded on axis 0 with `pt` indexing the LOCAL point
    slice (use `partition_gba_problem` to build them). Returns
    (cam_R, cam_t, points(sharded), masks dict, final_cost).
    """
    intr = (fx, fy, cx, cy, bf)
    axis = mesh.axis_names[0]
    kinds = [k for k, es in (("mono", mono), ("stereo", stereo),
                             ("bird", bird)) if es is not None]
    edge_list = [es for es in (mono, stereo, bird) if es is not None]

    def run(cam_R, cam_t, cam_fixed, cam_valid, points, pt_valid,
            *edge_list):
        C = cam_R.shape[0]
        Pn = points.shape[0]
        sets0 = list(zip(kinds, edge_list))
        referenced = jnp.zeros((Pn,), bool)
        for _, es in sets0:
            referenced = referenced.at[es.pt].max(es.valid)
        pt_free = pt_valid & referenced
        cam_free = cam_valid & ~cam_fixed

        def phase(state, sets, n_iters):
            def body(carry, _):
                cam_R, cam_t, points, lam = carry
                dxc, dxp, cost0 = _local_implicit_step(
                    cam_R, cam_t, cam_free, points, pt_free, sets, intr,
                    lam, axis, cg_iters)
                Rn, tn = lie.se3_update_left(cam_R, cam_t, dxc)
                pn = points + dxp
                cost1 = _local_cost(Rn, tn, pn, sets, intr, axis)
                bad_p = jax.lax.psum(
                    jnp.sum(~jnp.isfinite(dxp), dtype=jnp.int32), axis)
                ok = ((cost1 < cost0) & jnp.isfinite(cost1)
                      & jnp.all(jnp.isfinite(dxc)) & (bad_p == 0))
                cam_R = jnp.where(ok, Rn, cam_R)
                cam_t = jnp.where(ok, tn, cam_t)
                points = jnp.where(ok, pn, points)
                lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0),
                               1e-9, 1e8)
                return (cam_R, cam_t, points, lam), jnp.where(ok, cost1,
                                                              cost0)

            (Ro, to, po, _), costs = jax.lax.scan(
                body, state + (jnp.asarray(1e-4, state[0].dtype),), None,
                length=n_iters)
            return (Ro, to, po), costs[-1]

        from ..graph import ba as _ba

        def masks_of(state, sets):
            cam_R, cam_t, points = state
            return [_ba._classify(kind, cam_R, cam_t, points, es, intr)
                    for kind, es in sets]

        state = (cam_R, cam_t, points)
        state, _ = phase(state, sets0, iters_phase1)
        sets = sets0
        if reclassify:
            ms = masks_of(state, sets0)
            sets = [(k, es._replace(valid=m))
                    for (k, es), m in zip(sets0, ms)]
        state, cost = phase(state, sets, iters_phase2)
        final_masks = masks_of(state, sets0)
        cam_R, cam_t, points = state
        return (cam_R, cam_t, points, cost, *final_masks)

    from jax import shard_map

    rep = P()
    sh = P(axis)
    es_spec = EdgeSet(sh, sh, sh, sh, sh)
    f = shard_map(
        run, mesh=mesh,
        in_specs=(rep, rep, rep, rep, sh, sh) + (es_spec,) * len(edge_list),
        out_specs=(rep, rep, sh, rep) + (sh,) * len(edge_list),
        check_vma=False,
    )
    out = jax.jit(linalg.f32_matmul(f))(
        cam_R, cam_t, cam_fixed, cam_valid, points, pt_valid, *edge_list)
    cam_R, cam_t, points, cost = out[:4]
    masks = dict(zip(kinds, out[4:]))
    return cam_R, cam_t, points, masks, cost


def partition_gba_problem(n_dev: int, points, pt_valid, edge_sets):
    """Host-side partitioner: pad points to a multiple of n_dev (contiguous
    block sharding) and regroup every edge set so shard k's edges reference
    shard k's points via LOCAL indices, each shard padded to the same edge
    count.

    edge_sets: list of (kind, EdgeSet-with-GLOBAL-pt-indices or None)
    (numpy arrays). Returns (points_padded, pt_valid_padded,
    {kind: (EdgeSet, perm)}, P_padded) where perm maps the regrouped edge
    order back to the caller's original edge order (−1 for padding slots) —
    use it to scatter inlier masks back.
    """
    import numpy as np

    P_total = points.shape[0]
    P_pad = ((P_total + n_dev - 1) // n_dev) * n_dev
    points_p = np.zeros((P_pad, 3), np.float32)
    points_p[:P_total] = points
    pt_valid_p = np.zeros(P_pad, bool)
    pt_valid_p[:P_total] = pt_valid
    per = P_pad // n_dev
    out = {}
    for kind, es in edge_sets:
        if es is None:
            out[kind] = None
            continue
        pt = np.asarray(es.pt)
        cam = np.asarray(es.cam)
        obs = np.asarray(es.obs)
        info = np.asarray(es.info)
        valid = np.asarray(es.valid)
        shard = np.clip(pt, 0, P_pad - 1) // per
        # padding/invalid edges can go anywhere; spread them evenly so the
        # per-shard cap stays tight
        shard = np.where(valid, shard, np.arange(len(pt)) % n_dev)
        counts = np.bincount(shard, minlength=n_dev)
        cap = int(counts.max()) if len(counts) else 1
        cap = max(cap, 1)
        E_cap = cap * n_dev
        perm = np.full(E_cap, -1, np.int64)
        order = np.argsort(shard, kind="stable")
        off = 0
        for s in range(n_dev):
            k = counts[s]
            perm[s * cap: s * cap + k] = order[off:off + k]
            off += k
        sel = np.maximum(perm, 0)
        new = EdgeSet(
            jnp.asarray(cam[sel].astype(np.int32)),
            jnp.asarray((pt[sel] % per).astype(np.int32)),
            jnp.asarray(obs[sel].astype(np.float32)),
            jnp.asarray(info[sel].astype(np.float32)),
            jnp.asarray(valid[sel] & (perm >= 0)),
        )
        out[kind] = (new, perm)
    return points_p, pt_valid_p, out, P_pad


def place_gba_problem(mesh: Mesh, cam_R, cam_t, cam_fixed, cam_valid,
                      points_p, pt_valid_p, partitioned):
    """Device-put a `partition_gba_problem` output onto the mesh."""
    axis = mesh.axis_names[0]
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(axis))
    put_rep = lambda x: jax.device_put(jnp.asarray(x), rep)
    put_sh = lambda x: jax.device_put(jnp.asarray(x), sh)
    edges = {}
    for kind, v in partitioned.items():
        if v is None:
            edges[kind] = (None, None)
        else:
            es, perm = v
            edges[kind] = (EdgeSet(*(put_sh(x) for x in es)), perm)
    return (put_rep(cam_R), put_rep(cam_t), put_rep(cam_fixed),
            put_rep(cam_valid), put_sh(points_p), put_sh(pt_valid_p), edges)


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
