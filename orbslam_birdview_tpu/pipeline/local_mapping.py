"""Local mapping: keyframe processing, triangulation, culling, local BA.

Re-designs `/root/reference/src/LocalMapping.cc` as a synchronous pipeline
stage (the reference runs it on its own pthread with mutex-guarded queues;
SURVEY §2.3/§7 replaces that with explicit scheduling):

- ProcessNewKeyFrame (`:138-178`): covisibility + landmark stats
- MapPointCulling (`:180-215`): found-ratio < 0.25, or unseen in 2-3 KFs
- CreateNewMapPoints (`:217-462`): epipolar search + triangulation vs the
  best covisible neighbors — one dense device op per neighbor
- SearchInNeighbors/Fuse (`:464-544`): duplicate merging by projection
- Local BA with birdview edges (`OptimizerBirdview.cc:704-1208`) — the
  Schur-complement solver in graph/ba.py
- KeyFrameCulling (`:642-706`): ≥90% of points seen ≥3× elsewhere
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api.config import SlamConfig
from ..graph import ba, ba_large
from ..mapping.mapstore import INVALID, MapStore
from . import device_ops

# Deterministic-schedule landing offsets (in tracked frames): an
# overlapped result dispatched at tick k is folded in EXACTLY at tick
# k+LAG (blocking if its background transfer hasn't landed) — never
# earlier. Opportunistic (done()-polled) landings made map growth a
# function of host scheduling; fixed ticks make the pipeline a pure
# function of frame indices on any host. Transfers normally land within
# 1-2 frames, so the block only engages under contention.
STAGE_LAG_FRAMES = 2   # keyframe stage (triangulate / fuse) advance
BA_LAG_FRAMES = 6      # local-BA writeback
GBA_LAG_FRAMES = 12    # global-BA writeback (full-map solve)
# fuse batch row layout, shared by _dispatch_fuse and _apply_fuse: the
# reverse-pass row id is FUSE_ROW_PAD-1, so both sides MUST agree
FUSE_FWD_ROWS = 10
FUSE_ROW_PAD = FUSE_FWD_ROWS + 1


class LocalMapper:
    def __init__(self, cfg: SlamConfig, store: MapStore):
        self.cfg = cfg
        self.store = store
        self.recent_mp: list[tuple[int, int]] = []  # (mp_id, birth kf index)
        self.level_sigma2 = np.array(
            [cfg.orb.scale_factor ** (2 * l) for l in range(cfg.orb.n_levels)],
            np.float32,
        )
        self.scale_factors = np.array(
            [cfg.orb.scale_factor ** l for l in range(cfg.orb.n_levels)],
            np.float32,
        )
        self.loop_closer = None  # attached by System
        from collections import deque

        self._kf_queue: "deque[int]" = deque()  # minted, stages not started
        self._ba_pending = None   # in-flight async local BA (finalize_ba)
        self._gba_pending = None  # in-flight async global BA (finalize_gba)
        self._gba_rounds_left = 0  # extra GBA rounds to dispatch on landing
        self._kf_stage = None     # keyframe mapping pipeline stage
        self._gba_tick = 0        # tick when the pending GBA dispatched
        # deterministic-schedule ticks (see STAGE/BA/GBA_LAG_FRAMES above)
        self._frame_tick = 0      # incremented once per tracked frame
        # count of device-compacted stage results that overflowed their
        # shipping cap (dropped candidates) — observability, never silent
        self.compact_overflows = 0
        self._stage_tick = 0      # tick when the current stage dispatched
        self._ba_tick = 0         # tick when the pending BA dispatched
        # device-resident per-keyframe keypoint arrays (xy, octave, valid,
        # desc_u8), registered at mint time from the fused frame's own
        # device outputs: triangulate/fuse dispatches re-uploaded
        # ~90 KB x 11 neighbors x 2 dispatches of immutable keypoint data
        # from the host EVERY keyframe — on the tunnel link that H2D was
        # a measurable slice of the per-keyframe stall
        self._kf_dev: dict[int, tuple] = {}
        # bumped on LARGE pose rewrites (GBA writeback; loop corrections
        # bump store.correction_epoch): the tracker's device pose chain is
        # valid while both are unchanged. Incremental local-BA nudges do
        # NOT invalidate it — the per-frame pose LM re-converges onto the
        # updated map, and a chain resync costs a velocity^lag
        # extrapolation that fails under rotation.
        self.pose_epoch = 0

    def register_kf_device(self, kf: int, xy, octave, valid, desc_u8):
        """Cache a minted keyframe's immutable keypoint arrays on DEVICE
        (they are the fused tracking step's own outputs — no transfer).
        Stale entries for culled keyframes are pruned opportunistically."""
        self._kf_dev[kf] = (xy, octave, valid, desc_u8)
        if len(self._kf_dev) > 16:
            store = self.store
            dead = [k for k in self._kf_dev
                    if k < store.n_kf and not store.kf_valid[k]]
            for k in dead:
                del self._kf_dev[k]

    def _kf_dev_stack(self, nbs):
        """Stacked device keypoint arrays for a neighbor batch, or None if
        any neighbor was minted through a host path (fallback: upload)."""
        entries = []
        for k in nbs:
            e = self._kf_dev.get(int(k))
            if e is None:
                return None
            entries.append(e)
        return tuple(jnp.stack([e[i] for e in entries]) for i in range(4))

    def poll_background(self) -> bool:
        """Advance any overlapped work that has finished (keyframe mapping
        stages, local BA, loop GBA); chain the next GBA round when one
        lands. Called once per tracked frame — never blocks.

        Returns True only when POSES moved (BA/GBA landed) — the tracker
        invalidates its device pose chain on that. Stage advances that only
        add/merge landmarks leave the chain valid; the tracker picks the
        new points up through the big_change_idx bundle refresh."""
        # the loop-closing stage can run inside _advance_kf_stage: a loop
        # correction rewrites ALL keyframe poses, so an epoch bump must
        # count as poses_moved even though no BA landed this poll
        epoch0 = self.store.correction_epoch
        self._frame_tick += 1
        if self._kf_stage is None:
            if self._kf_queue:
                # starting the next keyframe's stages is dispatch-only
                self._advance_kf_stage(budget=1)
        elif self._frame_tick - self._stage_tick >= STAGE_LAG_FRAMES:
            # the current stage's landing tick: fold it in (blocking if
            # the transfer is still riding) and advance ONE transition
            self._advance_kf_stage(block=True, budget=1)
        poses_moved = False
        if self._ba_pending is not None:
            if self._frame_tick - self._ba_tick >= BA_LAG_FRAMES:
                poses_moved = self.finalize_ba(block=True)
            else:
                self.finalize_ba(start_fetch_only=True)
        poses_moved |= self.store.correction_epoch != epoch0
        if self._gba_pending is not None:
            due = self._frame_tick - self._gba_tick >= GBA_LAG_FRAMES
            if due and self.finalize_gba(block=True):
                poses_moved = True
                if self._gba_rounds_left > 0:
                    self._gba_rounds_left -= 1
                    self.global_ba(iters=self._gba_iters,
                                   async_dispatch=True)
            elif not due:
                self.finalize_gba(start_fetch_only=True)
        return poses_moved

    def drain_background(self):
        """Blocking drain: finish the keyframe stage pipeline (including
        queued keyframes), land local BA, then every remaining GBA round."""
        self.drain_kf_stages()
        self.finalize_ba(block=True)
        if self.loop_closer is not None:
            # a finished vocabulary trainer must land even when the run
            # ends before its fixed keyframe tick (otherwise loop closing
            # and BoW relocalization stay silently disabled)
            self.loop_closer.flush_vocab()
        while self._gba_pending is not None:
            self.finalize_gba(block=True)
            if self._gba_rounds_left > 0:
                self._gba_rounds_left -= 1
                self.global_ba(iters=self._gba_iters, async_dispatch=True)

    _gba_iters = (5, 5)

    # ------------------------------------------------------------------
    # keyframe processing as an overlapped stage pipeline
    #
    # The reference runs `LocalMapping::Run` on its own pthread
    # (`src/System.cc:103`), so triangulation / fuse / local BA never stall
    # the tracking thread. Here the same overlap comes from JAX's async
    # dispatch: each stage launches its device program and a background D2H
    # fetch, and the tracker's per-frame `poll_background` advances to the
    # next stage when the fetch has landed. A keyframe event itself only
    # pays for host bookkeeping + one dispatch.
    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int):
        import os

        if (os.environ.get("ORB_SYNC_MAPPING")
                or self.cfg.tracking.synchronous):
            # deterministic/debug: run the whole keyframe path blocking
            # (no overlap with tracking) — for isolating pipeline effects
            self.drain_kf_stages()
            self.finalize_ba(block=True)
            self._kf_queue.append(kf)
            self.drain_kf_stages()
            self.finalize_ba(block=True)
            return
        # Overlapped: ENQUEUE and return — the mint itself never drains the
        # previous keyframe's in-flight stages (round-2 review: draining
        # here serialized the whole mapping tail onto one tracked frame,
        # ~110-320 ms p95). Stages of consecutive keyframes coexist the
        # way the reference's mapping thread consumes its queue with lag
        # (`mlNewKeyFrames`, include/LocalMapping.h:107); the per-frame
        # poll_background advances them as their fetches land.
        self._kf_queue.append(kf)
        if self._kf_stage is None:
            self._advance_kf_stage(budget=1)  # start now: dispatch-only

    def drain_kf_stages(self):
        """Blocking: run every queued keyframe's stages to completion."""
        while self._kf_stage is not None or self._kf_queue:
            self._advance_kf_stage(block=True)

    @property
    def mapping_idle(self) -> bool:
        """AcceptKeyFrames analogue for the keyframe policy: no stage in
        flight and nothing queued (`LocalMapping::AcceptKeyFrames`)."""
        return self._kf_stage is None and not self._kf_queue

    def _advance_kf_stage(self, block: bool = False, budget=None) -> bool:
        """Advance the keyframe mapping pipeline:
        triangulate -> fuse -> {local BA dispatch, KF cull, loop closing};
        when the slot frees up, start the next queued keyframe's stages.

        Deterministic protocol: a stage's result is folded in ONLY by a
        `block=True` call at its landing tick (poll_background) or a
        drain — never opportunistically when its transfer happens to have
        landed. `budget` caps the number of stage TRANSITIONS (the poll
        passes 1 so each tick advances exactly one stage). Returns True
        if the map changed."""
        from ..utils.profiling import GLOBAL_TIMER as T

        changed = False
        while self._kf_stage is not None or self._kf_queue:
            if budget is not None and budget <= 0:
                return changed
            if self._kf_stage is None:
                nxt = self._kf_queue.popleft()
                if not self.store.kf_valid[nxt]:
                    continue
                # land a pending local BA before triangulating the next
                # keyframe — refined poses under the new points, and a
                # deterministic landing point (the mint IS an event of
                # the frame-indexed schedule)
                if self._ba_pending is not None:
                    if self.finalize_ba(block=True):
                        changed = True
                with T.stage("map.cull_points"):
                    self._cull_recent_points(nxt)
                with T.stage("map.tri_dispatch"):
                    self._kf_stage = ("triangulate", nxt,
                                      self._dispatch_triangulate(nxt))
                self._stage_tick = self._frame_tick
                if budget is not None:
                    budget -= 1
                continue
            if not block:
                return changed
            kind, kf, payload = self._kf_stage
            if not self.store.kf_valid[kf]:
                self._kf_stage = None
                continue
            if budget is not None:
                budget -= 1
            if kind == "triangulate":
                if payload is not None:
                    meta, fetch = payload
                    with T.stage("map.tri_apply"):
                        self._apply_triangulate(kf, meta, fetch.get())
                        changed = True
                self.store.update_covisibility(kf)
                with T.stage("map.fuse_dispatch"):
                    self._kf_stage = ("fuse", kf, self._dispatch_fuse(kf))
                self._stage_tick = self._frame_tick
            elif kind == "fuse":
                if payload is not None:
                    meta, fetch = payload
                    with T.stage("map.fuse_apply"):
                        self._apply_fuse(kf, meta, fetch.get())
                        changed = True
                store = self.store
                if store.kf_valid[: store.n_kf].sum() > 2:
                    with T.stage("map.ba_dispatch"):
                        # land the previous keyframe's BA if it is ready;
                        # if still in flight, dispatching the new BA drops
                        # it — the reference aborts the running local BA
                        # when a fresh keyframe arrives (mbAbortBA,
                        # src/LocalMapping.cc:84-91) for the same reason:
                        # the new window subsumes the stale result
                        self.finalize_ba(block=False)
                        self.local_ba(kf, async_dispatch=True)
                with T.stage("map.kf_cull"):
                    self._cull_keyframes(kf)
                if self.loop_closer is not None:
                    with T.stage("map.loop"):
                        self.loop_closer.process_keyframe(kf)
                        changed = True
                self._kf_stage = None
        return changed

    # ------------------------------------------------------------------
    def prewarm(self, bird: bool = False):  # bird kept for API stability
        """Compile the local-BA bucket ladder up front.

        The BA device program is shape-specialized (pow2-bucketed cams /
        points / edges); each NEW bucket hit mid-run costs a ~0.3-8 s
        remote trace+compile on the tunnel backend, which lands inside
        the frame stream exactly at a keyframe event (measured
        map.ba_dispatch p95 ~1 s). Dispatching dummy problems at the
        growth-path shapes here moves that cost to startup — and into
        the persistent compile cache, so every later process skips it
        entirely. Returns the number of programs warmed."""
        cam = self.cfg.camera
        cfg = self.cfg.mapping
        C = cfg.local_ba_window + cfg.local_ba_fixed
        # edge/point ratio spans ~1 (bird-point-heavy maps) to ~8 (long
        # covisibility windows); cover the whole band so no mid-run shape
        # is left to compile at a keyframe event
        ladder = []
        P = 1024
        while P <= cfg.local_ba_point_cap:
            for E in (P, 2 * P, 4 * P, 8 * P):
                if 1024 <= E <= cfg.local_ba_edge_cap:
                    ladder.append((C, P, E))
            P *= 2
        outs = []
        for C, P, E in ladder:
            R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))
            t = jnp.zeros((C, 3), jnp.float32)
            fixed = jnp.zeros(C, bool).at[0].set(True)
            pts = jnp.concatenate(
                [jnp.zeros((P, 2), jnp.float32),
                 jnp.full((P, 1), 8.0, jnp.float32)], 1)
            es = ba.EdgeSet(jnp.zeros(E, jnp.int32), jnp.zeros(E, jnp.int32),
                            jnp.full((E, 2), 300.0, jnp.float32),
                            jnp.ones(E, jnp.float32), jnp.ones(E, bool))
            # stereo/bird types are ALWAYS present in the production
            # problem (masked padding at mono_bucket//4 — see
            # _gather_ba_problem) so one prewarmed shape covers every
            # sensor mix
            Eb = max(E // 4, min(4096, cfg.local_ba_edge_cap))
            aux = ba.EdgeSet(
                jnp.zeros(Eb, jnp.int32), jnp.zeros(Eb, jnp.int32),
                jnp.full((Eb, 3), 1.0, jnp.float32),
                jnp.zeros(Eb, jnp.float32), jnp.zeros(Eb, bool))
            res = ba.bundle_adjust(
                R, t, fixed, jnp.ones(C, bool), pts, jnp.ones(P, bool),
                es, aux, aux,
                cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
                iters_phase1=5, iters_phase2=10)
            outs.append(res.cam_R)
        jax.block_until_ready(outs)
        return len(ladder)

    # ------------------------------------------------------------------
    def _cull_recent_points(self, kf: int):
        """MapPointCulling: drop low-found-ratio / under-observed points.
        Fully vectorized — one batched erase instead of per-point
        observation-map scans."""
        store = self.store
        cfg = self.cfg.mapping
        if not self.recent_mp:
            return
        arr = np.asarray(self.recent_mp, np.int64).reshape(-1, 2)
        ids, births = arr[:, 0], arr[:, 1]
        valid = store.mp_valid[ids]
        found = store.mp_found[ids].astype(np.float32)
        visible = np.maximum(store.mp_visible[ids], 1).astype(np.float32)
        age = kf - births
        kill = valid & (store.mp_visible[ids] >= 3) \
            & (found / visible < cfg.found_ratio_cull)
        if self.cfg.sensor == "mono":
            kill |= valid & (age >= 2) & (store.mp_n_obs[ids] <= 2)
        store.erase_points(ids[kill])
        keep = valid & ~kill & (age < 3)   # age>=3 graduates
        self.recent_mp = list(zip(ids[keep].tolist(),
                                  births[keep].tolist()))

    # ------------------------------------------------------------------
    def _dispatch_triangulate(self, kf: int):
        """CreateNewMapPoints, dispatch half: ONE device program covering
        every triangulation neighbor + a background D2H fetch."""
        store = self.store
        cfg = self.cfg
        n_pad = cfg.mapping.triangulation_neighbors
        neighbors = store.covisible_kfs(kf, min_weight=15, top_n=n_pad)
        if len(neighbors) == 0:
            return None
        c1 = store.kf_center(kf)
        # host-side baseline-vs-depth gate (LocalMapping.cc:254-270)
        good = [nb for nb in neighbors
                if (md := self._median_depth(nb)) > 0
                and np.linalg.norm(store.kf_center(nb) - c1) / md >= 0.01]
        if not good:
            return None
        K = jnp.asarray(cfg.camera.K)
        free1 = store.kf_kp_valid[kf] & (store.kf_kp_mp[kf] < 0)
        # all neighbors in ONE dispatch: pad the neighbor axis to the
        # config bucket so the program compiles once, mask the padding
        nbs = np.asarray(good + [good[-1]] * (n_pad - len(good)), np.int64)
        nb_ok = np.zeros(n_pad, bool)
        nb_ok[: len(good)] = True
        free2 = (store.kf_kp_valid[nbs] & (store.kf_kp_mp[nbs] < 0))
        dev1 = self._kf_dev.get(int(kf))
        dev2 = self._kf_dev_stack(nbs)
        if dev1 is not None:
            xy1, oct1, _, desc1 = dev1
        else:
            xy1 = jnp.asarray(store.kf_kp_xy[kf])
            oct1 = jnp.asarray(store.kf_kp_octave[kf])
            desc1 = jnp.asarray(store.kf_desc[kf])
        if dev2 is not None:
            xy2, oct2, _, desc2 = dev2
        else:
            xy2 = jnp.asarray(store.kf_kp_xy[nbs])
            oct2 = jnp.asarray(store.kf_kp_octave[nbs])
            desc2 = jnp.asarray(store.kf_desc[nbs])
        out = device_ops.epipolar_triangulate_batch(
            jnp.asarray(store.kf_R[kf]), jnp.asarray(store.kf_t[kf]),
            jnp.asarray(store.kf_R[nbs]), jnp.asarray(store.kf_t[nbs]),
            jnp.asarray(nb_ok), K,
            xy1, oct1,
            jnp.asarray(free1), desc1,
            xy2, oct2,
            jnp.asarray(free2), desc2,
            jnp.asarray(self.level_sigma2),
        )
        from ..utils.async_fetch import BackgroundFetch

        return (good, free1), BackgroundFetch(out)

    def _apply_triangulate(self, kf: int, meta, fetched):
        """CreateNewMapPoints, apply half: allocate the accepted points
        from the device-COMPACTED candidate list (sel_n, sel_k1, idx2, X,
        valid — at most TRI_COMPACT_CAP rows instead of the dense (N,K1)
        arrays; 25 KB vs 350 KB on a latency-bound link). The first
        (best-covisible) neighbor accepting a keypoint wins, matching the
        reference's serial visit order — the compaction emits candidates
        in neighbor-major order, so first-occurrence-per-keypoint is
        exactly that rule."""
        store = self.store
        good, free1 = meta
        sel_n, sel_k1, sel_idx2, sel_X, sel_valid, n_acc = fetched
        if int(n_acc) > len(sel_k1):
            self.compact_overflows += 1
        nbs = np.asarray(good, np.int64)
        m = (sel_valid & (sel_n < len(nbs)) & free1[sel_k1]
             & store.kf_valid[nbs[np.clip(sel_n, 0, len(nbs) - 1)]])
        sn, sk = sel_n[m], sel_k1[m]
        si, sX = sel_idx2[m], sel_X[m]
        if len(sk) == 0:
            return
        # dedupe per keypoint, keeping the first in neighbor-major order
        order = np.argsort(sk, kind="stable")
        sn, sk, si, sX = sn[order], sk[order], si[order], sX[order]
        k1, first = np.unique(sk, return_index=True)
        sn, si, sX = sn[first], si[first], sX[first]
        ids = store.alloc_points(
            sX.astype(np.float32), store.kf_desc[kf][k1], kf,
            int(store.kf_frame_id[kf]))
        store.add_observations(kf, k1, ids)
        # neighbor-side observations grouped per neighbor (≤10 vector calls)
        for j in np.unique(sn):
            sel = sn == j
            store.add_observations(int(nbs[j]), si[sel], ids[sel])
        free1[k1] = False
        self.recent_mp.extend(zip(ids.tolist(), [kf] * len(ids)))
        store.update_point_stats(ids, self.scale_factors)
        # fresh landmarks should enter the tracker's candidate bundle on
        # the next frame, not only when the local BA lands
        store.big_change_idx += 1

    def _create_new_points(self, kf: int):
        """Synchronous triangulation (tests / non-pipelined callers)."""
        payload = self._dispatch_triangulate(kf)
        if payload is not None:
            meta, fetch = payload
            self._apply_triangulate(kf, meta, fetch.get())
        self.store.update_covisibility(kf)

    def _median_depth(self, kf: int) -> float:
        store = self.store
        mp = store.kf_kp_mp[kf]
        ids = mp[mp >= 0]
        ids = ids[store.mp_valid[ids]] if len(ids) else ids
        if len(ids) == 0:
            return -1.0
        Xc = store.mp_pos[ids] @ store.kf_R[kf].T + store.kf_t[kf]
        return float(np.median(Xc[:, 2]))

    # ------------------------------------------------------------------
    def _dispatch_fuse(self, kf: int):
        """SearchInNeighbors, dispatch half. BOTH directions of the
        reference pass (src/LocalMapping.cc:464-544): project kf's points
        into ALL fuse neighbors, AND the union of the neighbors' points
        into kf — the reverse half is what attaches a new keyframe to its
        predecessors' fresh landmarks (without it, covisibility between
        consecutive keyframes collapses under fast rotation and
        triangulation pairs go stale). One device program + background
        fetch for everything."""
        store = self.store
        cam = self.cfg.camera
        neighbors = store.covisible_kfs(kf, min_weight=15, top_n=10)
        if len(neighbors) == 0:
            return None
        P = self.cfg.mapping.fuse_point_cap

        def bundle(ids):
            ids = ids[store.mp_valid[ids]]
            if len(ids) > P:
                order = np.argsort(-store.mp_n_obs[ids], kind="stable")
                ids = np.sort(ids[order[:P]])
            ids_p = np.pad(ids, (0, P - len(ids)))
            pvalid = np.zeros(P, bool)
            pvalid[: len(ids)] = True
            return ids, ids_p, pvalid

        mp = store.kf_kp_mp[kf]
        ids_f, ids_fp, pval_f = bundle(np.unique(mp[mp >= 0]))
        nmp = store.kf_kp_mp[neighbors]
        ids_r, ids_rp, pval_r = bundle(np.unique(nmp[nmp >= 0]))
        if len(ids_f) == 0 and len(ids_r) == 0:
            return None
        # forward rows: kf's points into each neighbor; final row: the
        # neighbor union into kf. Point sets differ per row, so the
        # landmark axis is stacked into the batch.
        n_fwd = FUSE_FWD_ROWS
        n_pad = FUSE_ROW_PAD
        nbs = np.asarray(
            list(neighbors) + [neighbors[-1]] * (n_fwd - len(neighbors))
            + [kf], np.int64)
        nb_ok = np.zeros(n_pad, bool)
        nb_ok[: len(neighbors)] = True
        nb_ok[-1] = len(ids_r) > 0
        fwd_pos = np.where(pval_f[:, None], store.mp_pos[ids_fp],
                           1e9).astype(np.float32)
        rev_pos = np.where(pval_r[:, None], store.mp_pos[ids_rp],
                           1e9).astype(np.float32)
        devn = self._kf_dev_stack(nbs)
        if devn is not None:
            kxy, koct, kval, kdesc = devn
        else:
            kxy = jnp.asarray(store.kf_kp_xy[nbs])
            koct = jnp.asarray(store.kf_kp_octave[nbs])
            kval = jnp.asarray(store.kf_kp_valid[nbs])
            kdesc = jnp.asarray(store.kf_desc[nbs])
        out = device_ops.fuse_project_batch2_fr(
            jnp.asarray(store.kf_R[nbs]), jnp.asarray(store.kf_t[nbs]),
            jnp.asarray(nb_ok),
            jnp.asarray(fwd_pos), jnp.asarray(pval_f),
            jnp.asarray(store.mp_desc[ids_fp]),
            jnp.asarray(rev_pos), jnp.asarray(pval_r),
            jnp.asarray(store.mp_desc[ids_rp]),
            kxy, koct, kval, kdesc,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            jnp.full(P, 3.0, jnp.float32))
        from ..utils.async_fetch import BackgroundFetch

        meta = (list(neighbors) + [kf], ids_f, pval_f, ids_r, pval_r,
                ids_fp, ids_rp)
        return meta, BackgroundFetch(out)

    def _apply_fuse(self, kf: int, meta, fetched):
        """SearchInNeighbors, apply half: merge duplicate landmarks (keep
        the better-observed one) from the device-COMPACTED match list
        ((row, landmark-slot, target-kp) triples, FUSE_COMPACT_CAP max —
        16 KB instead of the dense (N,P) 180 KB on a latency-bound
        link). The common outcome — the target keypoint had NO landmark
        yet — is one vectorized observation write per row; only true
        merges fall to the per-pair path. The last row is the REVERSE
        pass (neighbor-union points into kf)."""
        store = self.store
        rows, ids_f, pval_f, ids_r, pval_r, ids_fp, ids_rp = meta
        sel_row, sel_p, sel_tgt, sel_ok, n_acc = fetched
        if int(n_acc) > len(sel_p):
            self.compact_overflows += 1
        n_pad = FUSE_ROW_PAD   # same row-axis padding as _dispatch_fuse
        for j, nb in enumerate(rows):
            if not store.kf_valid[nb]:
                continue  # culled while the fuse batch was in flight
            reverse = j == len(rows) - 1
            ids_p = ids_rp if reverse else ids_fp
            pvalid = pval_r if reverse else pval_f
            row_id = j if not reverse else n_pad - 1
            keep = (sel_ok & (sel_row == row_id)
                    & pvalid[np.clip(sel_p, 0, len(pvalid) - 1)])
            fi = sel_p[keep]
            if len(fi) == 0:
                continue
            mp_id = ids_p[fi]
            tgt = sel_tgt[keep].astype(np.int64)
            alive = store.mp_valid[mp_id]   # may have merged away already
            existing = store.kf_kp_mp[nb, tgt]
            ex_dead = (existing < 0) | ~store.mp_valid[existing.clip(0)]
            add = alive & ex_dead
            store.add_observations(nb, tgt[add], mp_id[add])
            merge = np.nonzero(alive & ~ex_dead & (existing != mp_id))[0]
            for m in merge:
                a, b = int(mp_id[m]), int(existing[m])
                if not (store.mp_valid[a] and store.mp_valid[b]):
                    continue
                if store.mp_n_obs[b] >= store.mp_n_obs[a]:
                    store.replace_point(a, b)
                else:
                    store.replace_point(b, a)
        # the reverse pass changed kf's own observation set
        # (`SearchInNeighbors` ends with UpdateConnections,
        # src/LocalMapping.cc:540-544)
        store.update_covisibility(kf)

    # ------------------------------------------------------------------
    def _gather_ba_problem(self, kf_window, fixed_window, pad_to=None,
                           point_cap=None, edge_cap=None,
                           stereo_cap=None, bird_cap=None):
        """Extract padded BA arrays for the given keyframe window. pad_to
        fixes the camera count so the jitted BA compiles once; point/edge
        caps default to the local-BA buckets."""
        store = self.store
        cfg = self.cfg.mapping
        cam = self.cfg.camera
        point_cap = point_cap or cfg.local_ba_point_cap
        edge_cap = edge_cap or cfg.local_ba_edge_cap

        def pow2_bucket(n, lo, hi):
            # pad to the next power of two >= n (floor lo, ceiling hi):
            # small problems keep small device shapes (a 10-KF map must
            # not pay the full KITTI-scale cap), while the bucket ladder
            # bounds the number of compiled program shapes to log2(hi/lo)
            b = lo
            while b < n and b < hi:
                b *= 2
            return min(b, hi)
        all_kfs = np.concatenate([kf_window, fixed_window]).astype(np.int64)
        n_real = len(all_kfs)
        C = pad_to or n_real
        kf_slot = {int(k): i for i, k in enumerate(all_kfs)}
        # landmarks observed by the window
        mp = store.kf_kp_mp[kf_window]
        mp_ids = np.unique(mp[mp >= 0])
        mp_ids = mp_ids[store.mp_valid[mp_ids]]
        if len(mp_ids) > point_cap:
            # over-cap: uniform stride, NOT a prefix cut — ids are
            # allocation-ordered, so a prefix keeps only the OLDEST
            # landmarks and the window's fresh triangulations would never
            # be optimized once the map saturates the cap
            mp_ids = mp_ids[np.linspace(0, len(mp_ids) - 1,
                                        point_cap).astype(np.int64)]
        n_mp = len(mp_ids)
        # bird landmarks
        bmp = store.kf_bird_mp[kf_window]
        bmp_ids = np.unique(bmp[bmp >= 0])
        bmp_ids = bmp_ids[store.bmp_valid[bmp_ids]]
        bird_budget = max(point_cap - n_mp, 0)
        if len(bmp_ids) > bird_budget:
            # over-budget: uniform stride like the mono points above — a
            # prefix cut would keep only the OLDEST bird landmarks and
            # freshly minted BEV points would never be optimized once a
            # bird-heavy map saturates the cap
            bmp_ids = (bmp_ids[np.linspace(0, len(bmp_ids) - 1,
                                           bird_budget).astype(np.int64)]
                       if bird_budget else bmp_ids[:0])
        n_bmp = len(bmp_ids)
        P = pow2_bucket(n_mp + n_bmp, 1024, point_cap)
        points = np.zeros((P, 3), np.float32)
        points[:n_mp] = store.mp_pos[mp_ids]
        points[n_mp : n_mp + n_bmp] = store.bmp_pos[bmp_ids]
        pvalid = np.zeros(P, bool)
        pvalid[: n_mp + n_bmp] = True
        mp_slot = np.full(store.max_mp, -1, np.int64)
        mp_slot[mp_ids] = np.arange(n_mp)
        bmp_slot = np.full(store.max_bmp, -1, np.int64)
        bmp_slot[bmp_ids] = np.arange(n_bmp) + n_mp

        # mono edges (+ stereo where depth available) — one vectorized
        # sweep over the whole window instead of a per-KF python loop
        obs_win = store.kf_kp_mp[all_kfs]                        # (W, C)
        hit = ((obs_win >= 0) & (mp_slot[obs_win.clip(0)] >= 0)
               & store.kf_kp_valid[all_kfs])
        wi, ki = np.nonzero(hit)
        cam_slot = np.array([kf_slot[int(k)] for k in all_kfs], np.int64)
        oct_ = store.kf_kp_octave[all_kfs[wi], ki]
        info_all = 1.0 / self.level_sigma2[
            np.clip(oct_, 0, len(self.level_sigma2) - 1)]
        ur = store.kf_kp_ur[all_kfs[wi], ki]
        st = ur > 0
        mono = ~st
        e_cam = [cam_slot[wi[mono]]]
        e_pt = [mp_slot[obs_win[wi[mono], ki[mono]]]]
        e_obs = [store.kf_kp_xy[all_kfs[wi[mono]], ki[mono]]]
        e_info = [info_all[mono]]
        s_cam, s_pt, s_obs, s_info = [], [], [], []
        if st.any():
            s_cam = [cam_slot[wi[st]]]
            s_pt = [mp_slot[obs_win[wi[st], ki[st]]]]
            s_obs = [np.concatenate(
                [store.kf_kp_xy[all_kfs[wi[st]], ki[st]],
                 ur[st][:, None]], 1)]
            s_info = [info_all[st]]
        # bird edges
        b_cam, b_pt, b_obs, b_info = [], [], [], []
        if n_bmp:
            from ..core.camera import camera_to_base_extrinsics

            R_bc, t_bc = camera_to_base_extrinsics(
                self.cfg.tbc_quat, self.cfg.tbc_t)
            R_cb = np.asarray(R_bc).T
            t_cb = -R_cb @ np.asarray(t_bc)
            sig = self.cfg.tracking.bird_sigma_m
            w = self.cfg.tracking.bird_info_scale_ba / sig ** 2
            # one vectorized sweep over the whole window (the per-KF
            # python loop cost ~1 ms × C on every BA dispatch)
            kb_win = store.kf_bird_mp[all_kfs]                   # (W, Cb)
            bhit = ((kb_win >= 0) & (bmp_slot[kb_win.clip(0)] >= 0)
                    & store.kf_bird_valid[all_kfs])
            bwi, bki = np.nonzero(bhit)
            if len(bwi):
                obs_pc = (store.kf_bird_base[all_kfs[bwi], bki] @ R_cb.T
                          + t_cb)
                b_cam = [cam_slot[bwi]]
                b_pt = [bmp_slot[kb_win[bwi, bki]]]
                b_obs = [obs_pc]
                b_info = [np.full(len(bwi), w)]

        def mk_edges(cams, pts, obss, infos, obs_dim, cap, pad_target):
            if cams:
                cams = np.concatenate(cams).astype(np.int32)
                pts = np.concatenate(pts).astype(np.int32)
                obss = np.concatenate(obss).astype(np.float32)
                infos = np.concatenate(infos).astype(np.float32)
            else:
                cams = np.zeros(0, np.int32)
                pts = np.zeros(0, np.int32)
                obss = np.zeros((0, obs_dim), np.float32)
                infos = np.zeros(0, np.float32)
            if len(cams) > cap:
                # over-cap: uniform-stride subsample — a prefix cut would
                # keep only the earliest keyframes' edges (systematic bias)
                sel = np.linspace(0, len(cams) - 1, cap).astype(np.int64)
                cams, pts, obss, infos = cams[sel], pts[sel], obss[sel], infos[sel]
            n = min(len(cams), cap)
            # floor at pad_target, pow2 ladder above it (rare overflow)
            pad = pow2_bucket(n, pad_target, max(cap, pad_target)) - n
            return ba.EdgeSet(
                jnp.asarray(np.pad(cams[:n], (0, pad))),
                jnp.asarray(np.pad(pts[:n], (0, pad))),
                jnp.asarray(np.pad(obss[:n], ((0, pad), (0, 0)))),
                jnp.asarray(np.pad(infos[:n], (0, pad))),
                jnp.asarray(np.pad(np.ones(n, bool), (0, pad))),
            ), n

        # ONE compiled shape per (point, mono-edge) bucket regardless of
        # sensor mix: stereo/bird sets are ALWAYS present, padded (masked
        # invalid) to a fixed fraction of the mono bucket. Shape-churn is
        # the real cost — every distinct (types-present, bucket) combo is
        # an in-process retrace (~0.3-1 s Python) plus a remote compile on
        # a cold cache, paid mid-run at a keyframe event; the masked
        # padding rows cost ~15% extra edge compute on a program that is
        # itself microseconds on the MXU.
        cap = edge_cap
        n_mono_raw = sum(len(c) for c in e_cam)
        B_m = pow2_bucket(min(n_mono_raw, cap), 1024, cap)
        # aux types HARD-subsample to the pad size so the shape is a pure
        # function of (P, B_m) — a bird-heavy window must not mint a new
        # bucket of its own (4096 aux edges is ample constraint density;
        # the reference's local BA carries hundreds of bird edges)
        aux_pad = max(B_m // 4, min(4096, cap))
        if stereo_cap is not None or bird_cap is not None:
            # caller-specified caps (global BA) keep their own buckets
            aux_s, aux_b = stereo_cap or cap // 4, bird_cap or cap // 4
            mono_es, n_mono = mk_edges(e_cam, e_pt, e_obs, e_info, 2, cap,
                                       B_m)
            stereo_es, n_st = mk_edges(s_cam, s_pt, s_obs, s_info, 3,
                                       aux_s, min(aux_pad, aux_s))
            bird_es, n_bird = mk_edges(b_cam, b_pt, b_obs, b_info, 3,
                                       aux_b, min(aux_pad, aux_b))
        else:
            mono_es, n_mono = mk_edges(e_cam, e_pt, e_obs, e_info, 2, cap,
                                       B_m)
            stereo_es, n_st = mk_edges(s_cam, s_pt, s_obs, s_info, 3,
                                       aux_pad, aux_pad)
            bird_es, n_bird = mk_edges(b_cam, b_pt, b_obs, b_info, 3,
                                       aux_pad, aux_pad)
        # NOTE: empty stereo/bird sets stay as all-invalid masked EdgeSets
        # (NOT None): bundle_adjust's jit cache keys on pytree structure,
        # and prewarm() compiles the both-aux-present variants — converting
        # to None here would miss every prewarmed executable and re-pay the
        # 0.3-8 s remote compile at the first real keyframe event.
        camR_np = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
        camt_np = np.zeros((C, 3), np.float32)
        camR_np[:n_real] = store.kf_R[all_kfs]
        camt_np[:n_real] = store.kf_t[all_kfs]
        fixed = np.ones(C, bool)   # padding slots are fixed
        fixed[: len(kf_window)] = False
        # always anchor the first keyframe
        for i, k in enumerate(all_kfs):
            if int(k) == 0:
                fixed[i] = True
        cam_valid = np.zeros(C, bool)
        cam_valid[:n_real] = True
        return (all_kfs, jnp.asarray(camR_np), jnp.asarray(camt_np),
                jnp.asarray(fixed), jnp.asarray(cam_valid),
                jnp.asarray(points), jnp.asarray(pvalid),
                mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp,
                n_mono)

    def local_ba(self, kf: int, iters=(5, 10), async_dispatch: bool = False):
        """Dispatch the local BA. With `async_dispatch` the device program is
        launched but NOT read back — tracking frames overlap its compute and
        `finalize_ba` lands the result when it is ready (the reference runs
        local BA on the mapping thread while tracking continues,
        `src/System.cc:102-115`; this is the same overlap without threads:
        JAX dispatch is already asynchronous)."""
        store = self.store
        cfg = self.cfg.mapping
        cam = self.cfg.camera
        window = store.covisible_kfs(kf, min_weight=15,
                                     top_n=cfg.local_ba_window - 1)
        window = np.concatenate([[kf], window]).astype(np.int64)
        # fixed frontier: KFs observing window landmarks but not in window
        mp = store.kf_kp_mp[window]
        mp_ids = np.unique(mp[mp >= 0])
        obs = store.kf_kp_mp[: store.n_kf]
        member = np.zeros(store.max_mp, bool)
        member[mp_ids] = True
        sees = (member[obs.clip(0)] & (obs >= 0)).any(1)
        sees &= store.kf_valid[: store.n_kf]
        frontier = np.setdiff1d(np.nonzero(sees)[0], window)[: cfg.local_ba_fixed]
        # camera axis padded to the hard cap ALWAYS: the cam-axis cost is
        # negligible (a 288x288 Schur system) and a varying C would
        # multiply the compile-shape ladder the point/edge buckets already
        # create — each new shape is a ~0.3-8 s remote compile mid-run
        pad_to = cfg.local_ba_window + cfg.local_ba_fixed
        (all_kfs, cam_R, cam_t, fixed, cam_valid, points, pvalid,
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp,
         n_mono) = \
            self._gather_ba_problem(window, frontier, pad_to=pad_to)
        res = ba.bundle_adjust(
            cam_R, cam_t, fixed, cam_valid, points, pvalid,
            mono_es, stereo_es, bird_es,
            cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
            iters_phase1=iters[0], iters_phase2=iters[1],
        )
        pend = dict(res=res, window=window, all_kfs=all_kfs,
                    mono_es=mono_es, mp_ids=mp_ids, bmp_ids=bmp_ids,
                    n_mp=n_mp, n_bmp=n_bmp, n_mono=n_mono,
                    epoch=store.correction_epoch)
        self._ba_tick = self._frame_tick
        if async_dispatch and cfg.async_local_ba:
            self._ba_pending = pend
        else:
            self._ba_pending = pend
            self.finalize_ba(block=True)

    def finalize_ba(self, block: bool = False,
                    start_fetch_only: bool = False) -> bool:
        """Land an in-flight local BA: write poses/points back to the store
        and erase outlier observations.

        Deterministic protocol: the writeback happens ONLY on a
        `block=True` call — poll_background issues it at the BA's fixed
        landing tick, drains at flush. `start_fetch_only` launches the
        background D2H transfer as soon as the device compute is done (so
        the landing tick rarely blocks) WITHOUT folding anything in.
        Returns True when a writeback happened (callers invalidate device
        pose chains / candidate bundles)."""
        pend = self._ba_pending
        if pend is None:
            return False
        res = pend["res"]
        fetch = pend.get("fetch")
        if fetch is None:
            is_ready = getattr(res.cam_R, "is_ready", None)
            if block or is_ready is None or is_ready():
                from ..utils.async_fetch import BackgroundFetch

                # slice to the REAL problem size before the transfer: the
                # device arrays are pow2-bucket padded (e.g. points 8192
                # rows for a ~2k-landmark window, edges 16384 for ~4k) —
                # on the latency/bandwidth-bound tunnel the padding rows
                # were most of the bytes. The mono edge (cam, pt) columns
                # ride the SAME batched fetch: reading them later via
                # np.asarray was a second hidden ~130 KB round trip.
                n_real = len(pend["all_kfs"])
                n_pts = pend["n_mp"] + pend["n_bmp"]
                n_mono = pend["n_mono"]
                mono_es = pend["mono_es"]
                fetch = pend["fetch"] = BackgroundFetch(
                    (res.cam_R[:n_real], res.cam_t[:n_real],
                     res.points[:n_pts], res.inl_mono[:n_mono],
                     mono_es.cam[:n_mono], mono_es.pt[:n_mono]))
        if not block or start_fetch_only:
            return False
        arrays = fetch.get()
        self._ba_pending = None
        store = self.store
        if store.correction_epoch != pend["epoch"]:
            # a loop correction rewrote the map while this BA was in flight —
            # its result is stale; drop it (the reference aborts local BA on
            # loop closure via mbAbortBA, `src/LocalMapping.cc:84-91`)
            return False
        window, all_kfs = pend["window"], pend["all_kfs"]
        mp_ids, bmp_ids = pend["mp_ids"], pend["bmp_ids"]
        n_mp, n_bmp = pend["n_mp"], pend["n_bmp"]
        camR_np, camt_np, pts_out, inl, ecam, ept = arrays
        nw = len(window)
        live = store.kf_valid[window]   # culled while BA was in flight
        store.kf_R[window[live]] = camR_np[:nw][live]
        store.kf_t[window[live]] = camt_np[:nw][live]
        mp_live = store.mp_valid[mp_ids]
        store.mp_pos[mp_ids[mp_live]] = pts_out[:n_mp][mp_live]
        if n_bmp:
            b_live = store.bmp_valid[bmp_ids]
            store.bmp_pos[bmp_ids[b_live]] = \
                pts_out[n_mp : n_mp + n_bmp][b_live]
        # erase outlier observations (mono edges only — like the reference),
        # grouped per keyframe: one membership scan per KF in the window
        # instead of one per bad edge. The first n_mono edges are exactly
        # the valid ones (mk_edges pads with valid=False past n).
        bad = np.nonzero(~inl & (ept < n_mp))[0]
        if len(bad):
            bad_k = all_kfs[ecam[bad]]
            bad_mp = mp_ids[ept[bad]]
            keep = store.mp_valid[bad_mp] & store.kf_valid[bad_k]
            bad_k, bad_mp = bad_k[keep], bad_mp[keep]
            for k in np.unique(bad_k):
                member = np.zeros(store.max_mp, bool)
                member[bad_mp[bad_k == k]] = True
                row = store.kf_kp_mp[k]
                kps = np.nonzero((row >= 0) & member[row.clip(0)])[0]
                if len(kps):
                    store.remove_observation(int(k), kps)
        store.big_change_idx += 1
        return True

    # ------------------------------------------------------------------
    def initial_global_ba(self, kf1: int, kf2: int, iters: int = 20):
        """`CreateInitialMapMonocular`'s GlobalBundleAdjustemntWithBirdview(20)."""
        store = self.store
        cam = self.cfg.camera
        window = np.array([kf1, kf2], np.int64)
        (all_kfs, cam_R, cam_t, fixed, cam_valid, points, pvalid,
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp,
         n_mono) = \
            self._gather_ba_problem(window, np.zeros(0, np.int64))
        fixed = jnp.asarray(np.array([True, False]))
        res = ba.bundle_adjust(
            cam_R, cam_t, fixed, cam_valid, points, pvalid,
            mono_es, stereo_es, bird_es,
            cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
            iters_phase1=iters // 2, iters_phase2=iters - iters // 2,
        )
        store.kf_R[window] = np.asarray(res.cam_R[:2])
        store.kf_t[window] = np.asarray(res.cam_t[:2])
        pts_out = np.asarray(res.points)
        store.mp_pos[mp_ids] = pts_out[:n_mp]
        if n_bmp:
            store.bmp_pos[bmp_ids] = pts_out[n_mp : n_mp + n_bmp]

    # ------------------------------------------------------------------
    def global_ba(self, iters=(5, 5), async_dispatch: bool = False):
        """Full-map BA: ALL keyframes and landmarks, only KF0 fixed
        (`GlobalBundleAdjustemntWithBirdview`, OptimizerBirdview.cc:24-297).
        Shapes are bucketed to powers of two to bound recompiles.

        With `async_dispatch` the solve is launched and `finalize_gba` lands
        it later — tracking frames keep flowing while the device grinds the
        full map, exactly the reference's detached GBA thread
        (`LoopClosing::RunGlobalBundleAdjustment`, src/LoopClosing.cc:645-758);
        keyframes/points created meanwhile are corrected by spanning-tree
        propagation at landing time (`:665-748`)."""
        store = self.store
        cam = self.cfg.camera
        valid = store.valid_kf_ids()
        if len(valid) < 2:
            return
        # bucket the camera/point/edge counts to powers of two
        C = 1 << max(int(np.ceil(np.log2(len(valid)))), 2)
        n_pts = int(store.mp_valid.sum() + store.bmp_valid.sum())
        point_cap = 1 << max(int(np.ceil(np.log2(max(n_pts, 1)))), 8)
        # per-type edge buckets sized from actual counts (a shared cap with
        # a fixed //4 split silently truncated bird edges on bird-heavy maps)
        def bucket(n):
            return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 10)

        n_front = int((store.kf_kp_mp[: store.n_kf] >= 0).sum())
        n_bird_e = int((store.kf_bird_mp[: store.n_kf] >= 0).sum())
        window = valid
        (all_kfs, cam_R, cam_t, fixed, cam_valid, points, pvalid,
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp,
         n_mono) = \
            self._gather_ba_problem(window, np.zeros(0, np.int64), pad_to=C,
                                    point_cap=point_cap,
                                    edge_cap=bucket(n_front),
                                    stereo_cap=bucket(n_front),
                                    bird_cap=bucket(n_bird_e))
        # only anchor KF0 (fixed already marks padding + kf0)
        fixed_np = np.asarray(fixed).copy()
        fixed_np[: len(window)] = False
        for i, k in enumerate(all_kfs):
            if int(k) == 0:
                fixed_np[i] = True
        import jax

        if jax.device_count() > 1:
            # distributed GBA: map blocks sharded over the mesh, all edge
            # types (mono+stereo+bird), implicit-Schur PCG with one (C,6)
            # psum per CG matvec (parallel/sharded_ba.sharded_global_ba)
            from ..parallel import sharded_ba as sba

            n_dev = jax.device_count()
            mesh = sba.make_mesh()
            pts_p, ptv_p, part, P_pad = sba.partition_gba_problem(
                n_dev, np.asarray(points), np.asarray(pvalid),
                [("mono", mono_es), ("stereo", stereo_es),
                 ("bird", bird_es)])
            cR, ct, cf, cv, pts_d, ptv_d, edges = sba.place_gba_problem(
                mesh, cam_R, cam_t, fixed_np, np.asarray(cam_valid),
                pts_p, ptv_p, part)
            get = lambda k: edges[k][0] if edges[k][0] is not None else None
            R_s, t_s, X_s, _, _ = sba.sharded_global_ba(
                mesh, cR, ct, cf, cv, pts_d, ptv_d,
                get("mono"), get("stereo"), get("bird"),
                cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
                iters_phase1=iters[0], iters_phase2=iters[1])
            dev_R, dev_t, dev_X = R_s, t_s, X_s
        else:
            # solver selection: the dense-W Schur path materializes a
            # (C,6,P,3) coupling tensor — one MXU matmul, optimal for small
            # maps; past ~128 MB switch to the matrix-free implicit-Schur
            # PCG path (O(E) memory) so full-map GBA scales to KITTI maps
            dense_w_bytes = C * 6 * point_cap * 3 * 4
            solver = (ba.bundle_adjust if dense_w_bytes <= (128 << 20)
                      else ba_large.bundle_adjust_large)
            res = solver(
                cam_R, cam_t, jnp.asarray(fixed_np), cam_valid, points,
                pvalid, mono_es, stereo_es, bird_es,
                cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
                iters_phase1=iters[0], iters_phase2=iters[1],
            )
            dev_R, dev_t, dev_X = res.cam_R, res.cam_t, res.points
        pend = dict(dev_R=dev_R, dev_t=dev_t, dev_X=dev_X,
                    window=window, mp_ids=mp_ids, bmp_ids=bmp_ids,
                    n_mp=n_mp, n_bmp=n_bmp,
                    n_kf_snap=store.n_kf, n_mp_snap=store.n_mp,
                    n_bmp_snap=store.n_bmp,
                    epoch=store.correction_epoch)
        self._gba_pending = pend
        self._gba_tick = self._frame_tick
        if not async_dispatch:
            self.finalize_gba(block=True)

    def finalize_gba(self, block: bool = False,
                     start_fetch_only: bool = False) -> bool:
        """Land an in-flight global BA. Keyframes and landmarks created
        while it ran (they are not in the solve) are corrected by
        spanning-tree / reference-KF propagation — the reference's
        `RunGlobalBundleAdjustment` tail (src/LoopClosing.cc:665-748).
        Returns True when a writeback happened."""
        pend = self._gba_pending
        if pend is None:
            return False
        fetch = pend.get("fetch")
        if fetch is None:
            is_ready = getattr(pend["dev_R"], "is_ready", None)
            if block or is_ready is None or is_ready():
                from ..utils.async_fetch import BackgroundFetch

                fetch = pend["fetch"] = BackgroundFetch(
                    (pend["dev_R"], pend["dev_t"], pend["dev_X"]))
        if not block or start_fetch_only:
            return False
        arrays = fetch.get()
        self._gba_pending = None
        store = self.store
        if store.correction_epoch != pend["epoch"]:
            return False    # a newer loop correction superseded this GBA
        camR_out, camt_out, pts_out = arrays
        window, mp_ids, bmp_ids = \
            pend["window"], pend["mp_ids"], pend["bmp_ids"]
        n_mp, n_bmp = pend["n_mp"], pend["n_bmp"]
        # old poses of every KF alive now, for relative-pose propagation
        old_R = store.kf_R[: store.n_kf].copy()
        old_t = store.kf_t[: store.n_kf].copy()
        in_gba = np.zeros(store.n_kf, bool)
        in_gba[window[window < store.n_kf]] = True
        nw = len(window)
        live = store.kf_valid[window]
        store.kf_R[window[live]] = camR_out[:nw][live]
        store.kf_t[window[live]] = camt_out[:nw][live]
        mp_live = store.mp_valid[mp_ids]
        store.mp_pos[mp_ids[mp_live]] = pts_out[:n_mp][mp_live]
        if n_bmp:
            b_live = store.bmp_valid[bmp_ids]
            store.bmp_pos[bmp_ids[b_live]] = \
                pts_out[n_mp : n_mp + n_bmp][b_live]
        # --- propagate to keyframes created after dispatch (id order ⇒
        # each one's spanning-tree parent is already corrected) ----------
        corrected = in_gba.copy()
        for k in range(pend["n_kf_snap"], store.n_kf):
            if not store.kf_valid[k]:
                continue
            p = int(store.kf_parent[k])
            if p < 0 or p >= store.n_kf or not corrected[p]:
                continue
            # T_new(k) = T_old(k) · T_old(p)⁻¹ · T_new(p)
            R_rel = old_R[k] @ old_R[p].T
            t_rel = old_t[k] - R_rel @ old_t[p]
            store.kf_R[k] = (R_rel @ store.kf_R[p]).astype(np.float32)
            store.kf_t[k] = (R_rel @ store.kf_t[p] + t_rel
                             ).astype(np.float32)
            corrected[k] = True
        # --- propagate points created after dispatch via their ref KF ---
        for ids_new, pos, valid, ref in (
            (np.arange(pend["n_mp_snap"], store.n_mp), store.mp_pos,
             store.mp_valid, store.mp_ref_kf),
            (np.arange(pend["n_bmp_snap"], store.n_bmp), store.bmp_pos,
             store.bmp_valid, store.bmp_ref_kf),
        ):
            if len(ids_new) == 0:
                continue
            ids_new = ids_new[valid[ids_new]]
            refs = ref[ids_new]
            ok = (refs >= 0) & (refs < store.n_kf) & corrected[refs.clip(0)]
            for i, r in zip(ids_new[ok], refs[ok]):
                r = int(r)
                Xc = old_R[r] @ pos[i] + old_t[r]
                pos[i] = (store.kf_R[r].T @ (Xc - store.kf_t[r])
                          ).astype(np.float32)
        self.pose_epoch += 1
        store.big_change_idx += 1
        return True

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling (`src/LocalMapping.cc:642-706`): a local KF is
        redundant if ≥90% of its landmarks are observed by ≥3 OTHER
        keyframes at the same or finer scale (octave ≤ own octave + 1).
        A bare observation count over-culls: coarse far-away observations
        would count as redundancy for a fine close-up view."""
        store = self.store
        for cand in store.covisible_kfs(kf, min_weight=15):
            cand = int(cand)
            if cand == 0 or cand == kf:
                continue
            mp = store.kf_kp_mp[cand]
            kp_idx = np.nonzero(mp >= 0)[0]
            kp_idx = kp_idx[store.mp_valid[mp[kp_idx]]]
            ids = mp[kp_idx]
            if len(ids) < 10:
                continue
            own_oct = store.kf_kp_octave[cand][kp_idx]
            # other observers: the candidate's covisible keyframes
            others = np.nonzero((store.covis[cand, : store.n_kf] > 0)
                                & store.kf_valid[: store.n_kf])[0]
            others = others[others != cand]
            if len(others) == 0:
                continue
            slot = np.full(store.max_mp, -1, np.int64)
            slot[ids] = np.arange(len(ids))
            omp = store.kf_kp_mp[others]                 # (O, C)
            s = slot[omp.clip(0)]
            hit = (omp >= 0) & (s >= 0)
            fine = store.kf_kp_octave[others] <= own_oct[s.clip(0)] + 1
            counts = np.bincount(s[hit & fine], minlength=len(ids))
            redundant = int((counts >= 3).sum())
            if redundant > self.cfg.mapping.kf_cull_redundancy * len(ids):
                store.erase_keyframe(cand)
