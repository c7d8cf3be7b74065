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

import jax.numpy as jnp
import numpy as np

from ..api.config import SlamConfig
from ..frontend.keypoints import unpack_bits_to_pm1
from ..graph import ba, ba_large
from ..mapping.mapstore import INVALID, MapStore
from . import device_ops


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

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int):
        store = self.store
        self._cull_recent_points(kf)
        self._create_new_points(kf)
        store.update_covisibility(kf)
        self._fuse_neighbors(kf)
        if store.kf_valid[: store.n_kf].sum() > 2:
            self.local_ba(kf)
        self._cull_keyframes(kf)
        if self.loop_closer is not None:
            self.loop_closer.process_keyframe(kf)

    # ------------------------------------------------------------------
    def _cull_recent_points(self, kf: int):
        """MapPointCulling: drop low-found-ratio / under-observed points."""
        store = self.store
        cfg = self.cfg.mapping
        keep = []
        for mp_id, birth in self.recent_mp:
            if not store.mp_valid[mp_id]:
                continue
            found = store.mp_found[mp_id]
            visible = max(store.mp_visible[mp_id], 1)
            age = kf - birth
            if visible >= 3 and found / visible < cfg.found_ratio_cull:
                store.erase_point(mp_id)
            elif age >= 2 and store.mp_n_obs[mp_id] <= 2 and self.cfg.sensor == "mono":
                store.erase_point(mp_id)
            elif age >= 3:
                continue  # graduated
            else:
                keep.append((mp_id, birth))
        self.recent_mp = keep

    # ------------------------------------------------------------------
    def _create_new_points(self, kf: int):
        store = self.store
        cfg = self.cfg
        neighbors = store.covisible_kfs(
            kf, min_weight=15, top_n=cfg.mapping.triangulation_neighbors)
        if len(neighbors) == 0:
            return
        K = jnp.asarray(cfg.camera.K)
        free1 = store.kf_kp_valid[kf] & (store.kf_kp_mp[kf] < 0)
        desc1 = unpack_bits_to_pm1(jnp.asarray(store.kf_desc[kf]))
        c1 = store.kf_center(kf)
        for nb in neighbors:
            # require sufficient baseline vs scene depth (LocalMapping.cc:254-270)
            baseline = np.linalg.norm(store.kf_center(nb) - c1)
            med_depth = self._median_depth(nb)
            if med_depth <= 0 or baseline / med_depth < 0.01:
                continue
            free2 = store.kf_kp_valid[nb] & (store.kf_kp_mp[nb] < 0)
            desc2 = unpack_bits_to_pm1(jnp.asarray(store.kf_desc[nb]))
            idx2, X, ok = device_ops.epipolar_triangulate(
                jnp.asarray(store.kf_R[kf]), jnp.asarray(store.kf_t[kf]),
                jnp.asarray(store.kf_R[nb]), jnp.asarray(store.kf_t[nb]), K,
                jnp.asarray(store.kf_kp_xy[kf]),
                jnp.asarray(store.kf_kp_octave[kf]),
                jnp.asarray(free1), desc1,
                jnp.asarray(store.kf_kp_xy[nb]),
                jnp.asarray(store.kf_kp_octave[nb]),
                jnp.asarray(free2), desc2,
                jnp.asarray(self.level_sigma2),
            )
            ok = np.asarray(ok)
            idx2 = np.asarray(idx2)
            X = np.asarray(X)
            k1 = np.nonzero(ok)[0]
            if len(k1) == 0:
                continue
            k2 = idx2[k1]
            descs = store.kf_desc[kf][k1]
            ids = store.alloc_points(X[k1].astype(np.float32), descs, kf,
                                     int(store.kf_frame_id[kf]))
            store.add_observations(kf, k1, ids)
            store.add_observations(nb, k2, ids)
            free1[k1] = False
            self.recent_mp.extend((int(i), kf) for i in ids)
            store.update_point_stats(ids, self.scale_factors)
        store.update_covisibility(kf)

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
    def _fuse_neighbors(self, kf: int):
        """SearchInNeighbors: project kf's points into neighbors; merge
        duplicates (keep the better-observed landmark)."""
        store = self.store
        cam = self.cfg.camera
        neighbors = store.covisible_kfs(kf, min_weight=15, top_n=10)
        mp = store.kf_kp_mp[kf]
        ids = np.unique(mp[mp >= 0])
        ids = ids[store.mp_valid[ids]]
        if len(ids) == 0:
            return
        for nb in neighbors:
            uv, z, ok = device_ops.project_points(
                jnp.asarray(store.kf_R[nb]), jnp.asarray(store.kf_t[nb]),
                jnp.asarray(store.mp_pos[ids]),
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)
            idx, dist = device_ops.match_projected(
                uv, ok, jnp.asarray(store.mp_desc[ids]),
                jnp.asarray(store.kf_kp_xy[nb]),
                jnp.asarray(store.kf_kp_octave[nb]),
                jnp.asarray(store.kf_kp_valid[nb]),
                unpack_bits_to_pm1(jnp.asarray(store.kf_desc[nb])),
                jnp.full(ids.shape, 3.0, jnp.float32), None,
                max_dist_th=50,
            )
            idx = np.asarray(idx)
            found = np.nonzero(idx >= 0)[0]
            for fi in found:
                mp_id = int(ids[fi])
                tgt_kp = int(idx[fi])
                existing = store.kf_kp_mp[nb, tgt_kp]
                if existing == mp_id:
                    continue
                if existing >= 0 and store.mp_valid[existing]:
                    # merge: keep the more-observed point
                    if store.mp_n_obs[existing] >= store.mp_n_obs[mp_id]:
                        store.replace_point(mp_id, int(existing))
                    else:
                        store.replace_point(int(existing), mp_id)
                else:
                    store.add_observations(nb, np.array([tgt_kp]),
                                           np.array([mp_id]))

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
        all_kfs = np.concatenate([kf_window, fixed_window]).astype(np.int64)
        n_real = len(all_kfs)
        C = pad_to or n_real
        kf_slot = {int(k): i for i, k in enumerate(all_kfs)}
        # landmarks observed by the window
        mp = store.kf_kp_mp[kf_window]
        mp_ids = np.unique(mp[mp >= 0])
        mp_ids = mp_ids[store.mp_valid[mp_ids]][: point_cap]
        n_mp = len(mp_ids)
        # bird landmarks
        bmp = store.kf_bird_mp[kf_window]
        bmp_ids = np.unique(bmp[bmp >= 0])
        bmp_ids = bmp_ids[store.bmp_valid[bmp_ids]]
        bmp_ids = bmp_ids[: max(point_cap - n_mp, 0)]
        n_bmp = len(bmp_ids)
        P = point_cap
        points = np.zeros((P, 3), np.float32)
        points[:n_mp] = store.mp_pos[mp_ids]
        points[n_mp : n_mp + n_bmp] = store.bmp_pos[bmp_ids]
        pvalid = np.zeros(P, bool)
        pvalid[: n_mp + n_bmp] = True
        mp_slot = np.full(store.max_mp, -1, np.int64)
        mp_slot[mp_ids] = np.arange(n_mp)
        bmp_slot = np.full(store.max_bmp, -1, np.int64)
        bmp_slot[bmp_ids] = np.arange(n_bmp) + n_mp

        # mono edges (+ stereo where depth available)
        e_cam, e_pt, e_obs, e_info = [], [], [], []
        s_cam, s_pt, s_obs, s_info = [], [], [], []
        for k in all_kfs:
            slot = kf_slot[int(k)]
            kp_mp = store.kf_kp_mp[k]
            ki = np.nonzero((kp_mp >= 0) & (mp_slot[kp_mp.clip(0)] >= 0)
                            & store.kf_kp_valid[k])[0]
            oct_ = store.kf_kp_octave[k][ki]
            info = 1.0 / self.level_sigma2[np.clip(oct_, 0, len(self.level_sigma2) - 1)]
            ur = store.kf_kp_ur[k][ki]
            stereo_mask = ur > 0
            mono_mask = ~stereo_mask
            e_cam += [np.full(mono_mask.sum(), slot)]
            e_pt += [mp_slot[kp_mp[ki[mono_mask]]]]
            e_obs += [store.kf_kp_xy[k][ki[mono_mask]]]
            e_info += [info[mono_mask]]
            if stereo_mask.any():
                s_cam += [np.full(stereo_mask.sum(), slot)]
                s_pt += [mp_slot[kp_mp[ki[stereo_mask]]]]
                s_obs += [np.concatenate(
                    [store.kf_kp_xy[k][ki[stereo_mask]],
                     ur[stereo_mask][:, None]], 1)]
                s_info += [info[stereo_mask]]
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
            for k in all_kfs:
                slot = kf_slot[int(k)]
                kb = store.kf_bird_mp[k]
                bi = np.nonzero((kb >= 0) & (bmp_slot[kb.clip(0)] >= 0)
                                & store.kf_bird_valid[k])[0]
                if len(bi) == 0:
                    continue
                obs_pc = store.kf_bird_base[k][bi] @ R_cb.T + t_cb
                b_cam += [np.full(len(bi), slot)]
                b_pt += [bmp_slot[kb[bi]]]
                b_obs += [obs_pc]
                b_info += [np.full(len(bi), w)]

        def mk_edges(cams, pts, obss, infos, obs_dim, cap):
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
            pad = cap - n
            return ba.EdgeSet(
                jnp.asarray(np.pad(cams[:n], (0, pad))),
                jnp.asarray(np.pad(pts[:n], (0, pad))),
                jnp.asarray(np.pad(obss[:n], ((0, pad), (0, 0)))),
                jnp.asarray(np.pad(infos[:n], (0, pad))),
                jnp.asarray(np.pad(np.ones(n, bool), (0, pad))),
            ), n

        cap = edge_cap
        mono_es, n_mono = mk_edges(e_cam, e_pt, e_obs, e_info, 2, cap)
        stereo_es, n_st = mk_edges(s_cam, s_pt, s_obs, s_info, 3,
                                   stereo_cap or cap // 4)
        bird_es, n_bird = mk_edges(b_cam, b_pt, b_obs, b_info, 3,
                                   bird_cap or cap // 4)
        if n_st == 0:
            stereo_es = None
        if n_bird == 0:
            bird_es = None
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
                mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp)

    def local_ba(self, kf: int, iters=(5, 10)):
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
        pad_to = cfg.local_ba_window + cfg.local_ba_fixed
        (all_kfs, cam_R, cam_t, fixed, cam_valid, points, pvalid,
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp) = \
            self._gather_ba_problem(window, frontier, pad_to=pad_to)
        res = ba.bundle_adjust(
            cam_R, cam_t, fixed, cam_valid, points, pvalid,
            mono_es, stereo_es, bird_es,
            cam.fx, cam.fy, cam.cx, cam.cy, bf=cam.bf,
            iters_phase1=iters[0], iters_phase2=iters[1],
        )
        # write back
        nw = len(window)
        store.kf_R[window] = np.asarray(res.cam_R[:nw])
        store.kf_t[window] = np.asarray(res.cam_t[:nw])
        pts_out = np.asarray(res.points)
        store.mp_pos[mp_ids] = pts_out[:n_mp]
        if n_bmp:
            store.bmp_pos[bmp_ids] = pts_out[n_mp : n_mp + n_bmp]
        # erase outlier observations (mono edges only — like the reference)
        inl = np.asarray(res.inl_mono)
        ecam = np.asarray(mono_es.cam)
        ept = np.asarray(mono_es.pt)
        evalid = np.asarray(mono_es.valid)
        bad = evalid & ~inl
        for i in np.nonzero(bad)[0]:
            k = int(all_kfs[ecam[i]])
            mp_id = int(mp_ids[ept[i]]) if ept[i] < n_mp else -1
            if mp_id >= 0:
                kps = np.nonzero(store.kf_kp_mp[k] == mp_id)[0]
                if len(kps):
                    store.remove_observation(k, kps)
        store.big_change_idx += 1

    # ------------------------------------------------------------------
    def initial_global_ba(self, kf1: int, kf2: int, iters: int = 20):
        """`CreateInitialMapMonocular`'s GlobalBundleAdjustemntWithBirdview(20)."""
        store = self.store
        cam = self.cfg.camera
        window = np.array([kf1, kf2], np.int64)
        (all_kfs, cam_R, cam_t, fixed, cam_valid, points, pvalid,
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp) = \
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
    def global_ba(self, iters=(5, 5)):
        """Full-map BA: ALL keyframes and landmarks, only KF0 fixed
        (`GlobalBundleAdjustemntWithBirdview`, OptimizerBirdview.cc:24-297).
        Shapes are bucketed to powers of two to bound recompiles."""
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
         mono_es, stereo_es, bird_es, mp_ids, bmp_ids, n_mp, n_bmp) = \
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
            camR_out, camt_out = np.asarray(R_s), np.asarray(t_s)
            pts_out = np.asarray(X_s)
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
            camR_out, camt_out = np.asarray(res.cam_R), np.asarray(res.cam_t)
            pts_out = np.asarray(res.points)
        nw = len(window)
        store.kf_R[window] = camR_out[:nw]
        store.kf_t[window] = camt_out[:nw]
        store.mp_pos[mp_ids] = pts_out[:n_mp]
        if n_bmp:
            store.bmp_pos[bmp_ids] = pts_out[n_mp : n_mp + n_bmp]
        store.big_change_idx += 1

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling: a local KF is redundant if ≥90% of its points are
        seen by ≥3 other KFs at the same-or-finer scale."""
        store = self.store
        for cand in store.covisible_kfs(kf, min_weight=15):
            if cand == 0 or cand == kf:
                continue
            mp = store.kf_kp_mp[cand]
            ids = mp[mp >= 0]
            ids = ids[store.mp_valid[ids]]
            if len(ids) < 10:
                continue
            redundant = (store.mp_n_obs[ids] >= 4).sum()
            if redundant > self.cfg.mapping.kf_cull_redundancy * len(ids):
                store.erase_keyframe(int(cand))
