"""Loop closing: detection, Sim3 computation, loop correction, essential
graph, global BA.

Re-designs `/root/reference/src/LoopClosing.cc` as a synchronous pipeline
stage:
- DetectLoop (`:103-229`): BoW candidates above the min covisible score,
  with the 3-consecutive consistent-group check
- ComputeSim3 (`:231-400`): descriptor matching → batched RANSAC Horn Sim3
  (solvers/sim3.py) → loop-map-point projection gate
- CorrectLoop (`:402-585`): propagate the corrected Sim3 over the covisible
  group, correct landmarks, fuse duplicates, optimize the Sim3 essential
  graph (graph/pose_graph.py), then run a global BA
- vocabulary bootstrap: the reference ships a pretrained 1M-word file; we
  train a vocabulary from the map's own descriptors once enough keyframes
  exist (or accept a pretrained one).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api.config import SlamConfig
from ..core import lie
from ..frontend import matcher
from ..frontend.keypoints import unpack_bits_to_pm1
from ..graph import ba, pose_graph
from ..mapping import vocab as vocab_mod
from ..mapping.kfdb import KeyFrameDatabase
from ..mapping.mapstore import INVALID, MapStore
from ..solvers import sim3 as sim3_mod
from . import device_ops

_DEBUG = bool(__import__("os").environ.get("OSB_LOOP_DEBUG"))


def _dbg(*a):
    if _DEBUG:
        print("[loop]", *a, flush=True)


def _sim3_apply(R, t, s, p):
    return s * (p @ R.T) + t


def _sim3_inv(R, t, s):
    Rt = R.T
    return Rt, -(Rt @ t) / s, 1.0 / s


def _sim3_mul(Ra, ta, sa, Rb, tb, sb):
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


class LoopCloser:
    def __init__(self, cfg: SlamConfig, store: MapStore, mapper,
                 vocabulary: Optional[vocab_mod.Vocabulary] = None,
                 min_consistency: int = 3):
        self.cfg = cfg
        self.store = store
        self.mapper = mapper
        self.voc = vocabulary
        self.kfdb: Optional[KeyFrameDatabase] = None
        if vocabulary is not None:
            self.kfdb = KeyFrameDatabase(vocabulary, store)
        self.min_consistency = min_consistency
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -(10 ** 9)
        self.rng_key = jax.random.PRNGKey(42)
        self.n_loops_closed = 0
        # observability: every raw candidate set the database returned,
        # with the loop count at detection time — post-hoc candidate
        # audits on the FINAL map are blind (after a closure the true
        # revisits are covisible and correctly excluded), so quality
        # metrics must come from detections as they happened
        self.detection_log: list[tuple[int, tuple, int]] = []
        self._voc_thread = None
        self._voc_result = None
        self._voc_started_kf = 0

    # ------------------------------------------------------------------
    def _next_key(self):
        self.rng_key, k = jax.random.split(self.rng_key)
        return k

    def _kp_of(self, kf: int):
        from ..frontend.keypoints import Keypoints

        store = self.store
        u8 = store.kf_desc[kf]
        # pure host arrays — BoW registration never touches the device
        return Keypoints(
            xy=store.kf_kp_xy[kf],
            response=np.zeros(u8.shape[0], np.float32),
            angle=store.kf_kp_angle[kf],
            octave=store.kf_kp_octave[kf],
            valid=store.kf_kp_valid[kf],
            desc_u8=u8,
            desc_pm1=(np.unpackbits(u8, axis=-1, bitorder="little")
                      .astype(np.int8) * 2 - 1),
        )

    def _maybe_bootstrap_vocab(self):
        """Train a vocabulary from the young map's own descriptors on a
        WORKER thread (numpy k-majority releases the GIL in its BLAS
        kernels): the reference front-loads its 1M-word vocabulary load
        before tracking starts (src/System.cc:70-83), but here training
        lands mid-run — doing it inline cost a 1-2 s spike on one tracked
        frame. Until it finishes, loop closing simply starts later."""
        store = self.store
        if self.voc is not None or store.n_kf < 5:
            return
        if self._voc_thread is not None:
            # DETERMINISTIC landing: the trained vocabulary folds in at a
            # fixed keyframe index (start + 6), never "whenever the
            # worker happens to finish" — on a loaded host the trainer
            # could land after the loop-revisit window and loop closing
            # silently never engaged (a wall-clock race, the same defect
            # class the deterministic pipeline schedule removes). The
            # join blocks only if the worker is slower than ~6 keyframe
            # intervals.
            if store.n_kf < self._voc_started_kf + 6:
                return
            self._voc_thread.join()
            self._voc_thread = None
            if self._voc_result is not None:
                self.voc = self._voc_result
                self._voc_result = None
                self.kfdb = KeyFrameDatabase(self.voc, store)
                for kf in store.valid_kf_ids():
                    self.kfdb.add_keyframe(int(kf), self._kp_of(int(kf)))
            return
        descs = []
        for kf in store.valid_kf_ids():
            d = store.kf_desc[kf][store.kf_kp_valid[kf]]
            descs.append(d)
        all_d = np.concatenate(descs)
        pm1 = (np.unpackbits(all_d, axis=-1, bitorder="little")
               .astype(np.int8) * 2 - 1)

        def train():
            # 10k words (b=10, d=4) trains in <1 s of worker-thread CPU
            # and discriminates where the old 512-word budget could not:
            # on a self-similar circular scene the tiny vocabulary
            # inflated every pairwise BoW score to ~0.6, the covisible
            # min-score gate cut the TRUE revisit candidate, and loop
            # closing silently never fired
            self._voc_result = vocab_mod.train_vocabulary(
                pm1, branching=10, depth=4, seed=0, max_train=16000,
                iters=3)

        import threading

        self._voc_started_kf = store.n_kf
        self._voc_thread = threading.Thread(target=train, daemon=False)
        self._voc_thread.start()

    def flush_vocab(self):
        """Force-install a finished (or nearly finished) vocabulary trainer
        regardless of the fixed-tick landing schedule. Called on pipeline
        drain/flush: if keyframe minting stalled or the sequence ended
        before tick `start+6`, the steady-state landing never fires and the
        trained vocabulary would be silently discarded — permanently
        disabling loop closing and BoW relocalization for the run."""
        if self.voc is not None or self._voc_thread is None:
            return
        self._voc_thread.join()
        self._voc_thread = None
        if self._voc_result is not None:
            self.voc = self._voc_result
            self._voc_result = None
            store = self.store
            self.kfdb = KeyFrameDatabase(self.voc, store)
            for kf in store.valid_kf_ids():
                self.kfdb.add_keyframe(int(kf), self._kp_of(int(kf)))

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int) -> bool:
        """Returns True if a loop was closed."""
        self._maybe_bootstrap_vocab()
        if self.kfdb is None:
            return False
        store = self.store
        # register first so the keyframe's own BoW vector exists for the
        # queries below (the query logic excludes self and covisible KFs)
        self.kfdb.add_keyframe(kf, self._kp_of(kf))
        if kf - self.last_loop_kf < 10 or store.n_kf < 12:
            return False
        candidates = self._detect_loop(kf)
        closed = False
        if len(candidates):
            for cand in candidates:
                res = self._compute_sim3(kf, int(cand))
                if res is not None:
                    S, loop_points = res
                    self._correct_loop(kf, int(cand), S, loop_points)
                    closed = True
                    break
        return closed

    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int):
        min_score = self.kfdb.min_covisible_score(kf)
        cands = self.kfdb.detect_loop_candidates(kf, min_score)
        if len(cands):
            self.detection_log.append(
                (kf, tuple(int(c) for c in cands), self.n_loops_closed))
        if len(cands) == 0:
            self.consistent_groups = []
            return []
        # 3-consecutive-detection consistency (`DetectLoop`, :168-225)
        store = self.store
        enough = []
        new_groups: list[tuple[set, int]] = []
        for c in cands:
            group = set(
                int(x) for x in store.covisible_kfs(int(c), top_n=30)
            ) | {int(c)}
            best = 0
            for prev_set, count in self.consistent_groups:
                if group & prev_set:
                    best = max(best, count + 1)
            new_groups.append((group, best))
            if best >= self.min_consistency:
                enough.append(int(c))
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    def _compute_sim3(self, kf: int, cand: int):
        store = self.store
        # descriptor match restricted to keypoints with landmarks
        has_cur = (store.kf_kp_mp[kf] >= 0) & store.kf_kp_valid[kf]
        has_cnd = (store.kf_kp_mp[cand] >= 0) & store.kf_kp_valid[cand]
        cur_pm1 = unpack_bits_to_pm1(jnp.asarray(store.kf_desc[kf]))
        cnd_pm1 = unpack_bits_to_pm1(jnp.asarray(store.kf_desc[cand]))
        dist = matcher.hamming_matrix(cur_pm1, cnd_pm1,
                                      jnp.asarray(has_cur),
                                      jnp.asarray(has_cnd))
        idx, _ = matcher.match_mutual(dist, max_dist=matcher.TH_LOW, ratio=0.75)
        idx = np.asarray(idx)
        m = idx >= 0
        if m.sum() < 20:
            _dbg(f'kf={kf} cand={cand} desc matches={int(m.sum())} <20')
            return None
        ki = np.nonzero(m)[0]
        mp_cur = store.kf_kp_mp[kf][ki]
        mp_cnd = store.kf_kp_mp[cand][idx[ki]]
        ok = store.mp_valid[mp_cur] & store.mp_valid[mp_cnd]
        ki, mp_cur, mp_cnd = ki[ok], mp_cur[ok], mp_cnd[ok]
        n = len(ki)
        if n < 20:
            _dbg(f'kf={kf} cand={cand} valid-mp matches={n} <20')
            return None
        p_cur = store.mp_pos[mp_cur] @ store.kf_R[kf].T + store.kf_t[kf]
        p_cnd = store.mp_pos[mp_cnd] @ store.kf_R[cand].T + store.kf_t[cand]
        cam = self.cfg.camera
        sig2_cur = self._sigma2_of(kf, ki)
        sig2_cnd = self._sigma2_of(cand, np.asarray(idx)[ki])
        cap = 512
        npts = min(n, cap)
        pad = cap - npts

        def padp(x, d=None):
            x = x[:npts]
            return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

        fix_scale = self.cfg.sensor in ("stereo", "rgbd")
        res = sim3_mod.sim3_ransac(
            self._next_key(),
            jnp.asarray(padp(p_cur)), jnp.asarray(padp(p_cnd)),
            jnp.asarray(np.pad(np.ones(npts, bool), (0, pad))),
            jnp.asarray(np.pad(9.21 * sig2_cur[:npts], (0, pad)), jnp.float32),
            jnp.asarray(np.pad(9.21 * sig2_cnd[:npts], (0, pad)), jnp.float32),
            float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            fix_scale=fix_scale, min_inliers=20,
        )
        if not bool(res.ok):
            _dbg(f'kf={kf} cand={cand} n={n} ransac FAIL inl={int(res.n_inliers) if hasattr(res,"n_inliers") else "?"}')
            return None
        # reprojection-based refinement (OptimizeSim3) — the RANSAC Horn
        # scale is too loose to drive a loop correction
        from ..graph.sim3_opt import optimize_sim3_two_frame

        uv1 = store.kf_kp_xy[kf][ki]
        uv2 = store.kf_kp_xy[cand][np.asarray(idx)[ki]]
        Rr_, tr_, sr_, inl_, n_inl = optimize_sim3_two_frame(
            res.R, res.t, res.s,
            jnp.asarray(padp(p_cur)), jnp.asarray(padp(p_cnd)),
            jnp.asarray(padp(uv1)), jnp.asarray(padp(uv2)),
            jnp.asarray(np.pad(1.0 / sig2_cur[:npts], (0, pad)), jnp.float32),
            jnp.asarray(np.pad(1.0 / sig2_cnd[:npts], (0, pad)), jnp.float32),
            jnp.asarray(np.pad(np.ones(npts, bool), (0, pad))),
            cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=fix_scale, iters=12,
        )
        if int(n_inl) < 20:
            _dbg(f'kf={kf} cand={cand} n={n} sim3-refine inliers={int(n_inl)} <20')
            return None
        S = (np.asarray(Rr_), np.asarray(tr_), float(sr_))
        # loop-neighborhood projection gate (`ComputeSim3`, :355-397)
        loop_kfs = np.concatenate(
            [[cand], self.store.covisible_kfs(cand, top_n=10)])
        mp = store.kf_kp_mp[loop_kfs]
        loop_points = np.unique(mp[mp >= 0])
        loop_points = loop_points[store.mp_valid[loop_points]]
        if len(loop_points) < 40:
            _dbg(f'kf={kf} cand={cand} loop_points={len(loop_points)} <40')
            return None
        # project through corrected Scw into the current keyframe
        Rl, tl, sl = S
        Scw_R, Scw_t, Scw_s = _sim3_mul(Rl, tl, sl,
                                        store.kf_R[cand], store.kf_t[cand], 1.0)
        pc = Scw_s * (loop_points_pos := store.mp_pos[loop_points]) @ Scw_R.T + Scw_t
        pc = pc / Scw_s  # SE3-equivalent camera coords (divide by scale)
        z = pc[:, 2]
        u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
        vis = (z > 0.05) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        n_cap = 4096
        sel = np.nonzero(vis)[0][:n_cap]
        if len(sel) == 0:
            _dbg(f'kf={kf} cand={cand} no visible projected loop points')
            return None
        uv = np.zeros((n_cap, 2), np.float32)
        uv[: len(sel)] = np.stack([u[sel], v[sel]], 1)
        val = np.zeros(n_cap, bool)
        val[: len(sel)] = True
        ids_p = np.zeros(n_cap, np.int64)
        ids_p[: len(sel)] = loop_points[sel]
        idx2, _ = device_ops.match_projected(
            jnp.asarray(uv), jnp.asarray(val),
            jnp.asarray(store.mp_desc[ids_p]),
            jnp.asarray(store.kf_kp_xy[kf]),
            jnp.asarray(store.kf_kp_octave[kf]),
            jnp.asarray(store.kf_kp_valid[kf]),
            cur_pm1,
            jnp.full(n_cap, 10.0, jnp.float32), None,
            max_dist_th=matcher.TH_LOW,
        )
        n_matched = int((np.asarray(idx2) >= 0).sum())
        if n_matched < 40:
            _dbg(f'kf={kf} cand={cand} projection-gate matched={n_matched} <40 (vis={len(sel)})')
            return None
        return S, loop_points

    def _sigma2_of(self, kf: int, kp_idx):
        lvl = self.store.kf_kp_octave[kf][kp_idx]
        s2 = np.array([self.cfg.orb.scale_factor ** (2 * l)
                       for l in range(self.cfg.orb.n_levels)], np.float32)
        return s2[np.clip(lvl, 0, len(s2) - 1)]

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, S, loop_points):
        store = self.store
        # abort overlapped optimizations computed against the pre-loop map
        # (the reference sets mbStopGBA / aborts local BA before correcting,
        # LoopClosing.cc:402-440); the epoch bump below would discard them
        # at landing anyway — dropping now frees the device queue
        self.mapper._ba_pending = None
        self.mapper._gba_pending = None
        self.mapper._gba_rounds_left = 0
        Rl, tl, sl = S  # S_cur_cand: maps cand-camera into cur-camera (Sim3)
        # corrected Sim3 world→cur
        Scw = _sim3_mul(Rl, tl, sl, store.kf_R[cand], store.kf_t[cand], 1.0)

        group = np.concatenate([[kf], store.covisible_kfs(kf, top_n=30)])
        group = group.astype(np.int64)
        old_poses = {int(i): (store.kf_R[i].copy(), store.kf_t[i].copy())
                     for i in store.valid_kf_ids()}
        corrected: dict[int, tuple] = {}
        R_kf, t_kf = old_poses[kf]
        for i in group:
            Ri, ti = old_poses[int(i)]
            # T_i_cur = T_iw * T_wc (uncorrected)
            R_ic = Ri @ R_kf.T
            t_ic = ti - R_ic @ t_kf
            corrected[int(i)] = _sim3_mul(R_ic, t_ic, 1.0, *Scw)

        # correct landmarks observed by the group via their owner's Sim3
        done = np.zeros(store.max_mp, bool)
        for i in group:
            mp = store.kf_kp_mp[i]
            ids = np.unique(mp[mp >= 0])
            ids = ids[store.mp_valid[ids] & ~done[ids]]
            if len(ids) == 0:
                continue
            done[ids] = True
            Rc, tc, sc = corrected[int(i)]
            Ro, to = old_poses[int(i)]
            p_cam = store.mp_pos[ids] @ Ro.T + to
            Rinv, tinv, sinv = _sim3_inv(Rc, tc, sc)
            store.mp_pos[ids] = (sinv * (p_cam @ Rinv.T) + tinv).astype(np.float32)
        # also correct bird landmarks of the group
        doneb = np.zeros(store.max_bmp, bool)
        for i in group:
            bm = store.kf_bird_mp[i]
            ids = np.unique(bm[bm >= 0])
            ids = ids[store.bmp_valid[ids] & ~doneb[ids]] if len(ids) else ids
            if len(ids) == 0:
                continue
            doneb[ids] = True
            Rc, tc, sc = corrected[int(i)]
            Ro, to = old_poses[int(i)]
            p_cam = store.bmp_pos[ids] @ Ro.T + to
            Rinv, tinv, sinv = _sim3_inv(Rc, tc, sc)
            store.bmp_pos[ids] = (sinv * (p_cam @ Rinv.T) + tinv).astype(np.float32)

        # write corrected SE3 poses (R, t/s)
        for i, (Rc, tc, sc) in corrected.items():
            store.kf_R[i] = Rc.astype(np.float32)
            store.kf_t[i] = (tc / sc).astype(np.float32)

        # fuse loop points into EVERY corrected-group keyframe
        # (`SearchAndFuse`, src/LoopClosing.cc:587-613 iterates over all
        # CorrectedSim3 poses): the merged observations are the cross-seam
        # constraints that let the subsequent global BA reconcile the two
        # map sections — fusing only into the current KF leaves the seam
        # almost unconstrained.
        for gk in group:
            self._fuse_loop_points(int(gk), loop_points)
        for gk in group:
            store.update_covisibility(int(gk))

        # ---- essential graph -------------------------------------------
        # fully vectorized assembly: spanning-tree + strong-covisibility +
        # loop edges come out of array ops over the whole keyframe set —
        # the per-KF python loop with covisibility queries was O(K) on the
        # critical correction path while tracking is paused
        valid = store.valid_kf_ids()
        K = len(valid)
        slot_arr = np.full(store.max_kf, -1, np.int64)
        slot_arr[valid] = np.arange(K)
        slot = {int(k): i for i, k in enumerate(valid)}
        vR = store.kf_R[valid].copy()
        vt = store.kf_t[valid].copy()
        vs = np.ones(K, np.float32)
        for i, (Rc, tc, sc) in corrected.items():
            if slot_arr[i] >= 0:
                vR[slot_arr[i]] = Rc
                vt[slot_arr[i]] = tc
                vs[slot_arr[i]] = sc
        # pre-correction pose table over valid KFs (old_poses snapshot)
        oR = np.stack([old_poses[int(i)][0] for i in valid])
        ot = np.stack([old_poses[int(i)][1] for i in valid])
        # spanning-tree edges (parent -> child)
        par = store.kf_parent[valid]
        pok = (par >= 0) & (par < store.max_kf)
        pok[pok] &= store.kf_valid[par[pok]] & (slot_arr[par[pok]] >= 0)
        st_a = slot_arr[par[pok]]
        st_b = slot_arr[valid[pok]]
        # strong covisibility edges (weight >= 100), upper triangle
        W = store.covis[np.ix_(valid, valid)]
        ca, cb = np.nonzero(np.triu(W >= 100, k=1))
        # historical loop edges
        la, lb = [], []
        for a, b in store.loop_edges:
            if slot_arr[a] >= 0 and slot_arr[b] >= 0:
                la.append(slot_arr[a])
                lb.append(slot_arr[b])
        e_a = np.concatenate([st_a, ca, np.asarray(la, np.int64)])
        e_b = np.concatenate([st_b, cb, np.asarray(lb, np.int64)])
        # dedup (a,b) pairs regardless of order
        lo = np.minimum(e_a, e_b)
        hi = np.maximum(e_a, e_b)
        _, first = np.unique(lo * K + hi, return_index=True)
        e_a, e_b = e_a[first], e_b[first]
        # measurements from PRE-correction poses: S_ba = T_b · T_a⁻¹
        Ra, ta = oR[e_a], ot[e_a]
        Rb, tb = oR[e_b], ot[e_b]
        mR = np.einsum("nij,nkj->nik", Rb, Ra)
        mt = tb - np.einsum("nij,nj->ni", mR, ta)
        ms = np.ones(len(e_a), np.float32)
        e_i = e_a.tolist()
        e_j = e_b.tolist()
        mR = list(mR)
        mt = list(mt)
        ms = ms.tolist()
        e_w = [1.0] * len(e_i)
        # the new loop edge with the MEASURED Sim3 (cand -> kf)
        e_i.append(slot[cand]); e_j.append(slot[kf])
        mR.append(Rl); mt.append(tl); ms.append(sl)
        e_w.append(1.0)

        E = len(e_i)
        fixed = np.zeros(K, bool)
        fixed[slot[cand]] = True
        if jax.device_count() > 1:
            # edge shards reduced over ICI (parallel/sharded_pose_graph.py);
            # equals the single-device solve up to reduction order. Same
            # size-based solver split as the local branch below: dense
            # (7K,7K) psum for small graphs, matrix-free PCG with one (K,7)
            # psum per matvec past ~256 vertices (the dense H reduction is
            # 205 MB of ICI traffic per GN iteration at K=1024)
            from ..parallel import sharded_ba, sharded_pose_graph as spg

            mesh = sharded_ba.make_mesh()
            sharded = spg.shard_edges(
                mesh, np.array(e_i, np.int32), np.array(e_j, np.int32),
                np.stack(mR), np.stack(mt), np.array(ms, np.float32),
                np.array(e_w, np.float32), np.ones(E, bool))
            ssolver = (spg.sharded_optimize_sim3_graph if K <= 256
                       else spg.sharded_optimize_sim3_graph_pcg)
            R_out, t_out, s_out, cost = ssolver(
                mesh, jnp.asarray(vR), jnp.asarray(vt), jnp.asarray(vs),
                jnp.asarray(fixed), *sharded, n_iters=20)
        else:
            # pow2-bucket the vertex/edge axes (pad: fixed identity
            # vertices, invalid edges) so repeat loop events reuse one
            # compiled program per bucket instead of compiling per K; the
            # dense (7K x 7K) solver is right for small graphs, the EXACT
            # banded block-Thomas + Woodbury solver above ~256 vertices
            # (a dense K=1024 solve measured ~30 s host-side; truncated
            # PCG stalls on hard single-seam graphs at that scale)
            def b2(n):
                b = 64
                while b < n:
                    b *= 2
                return b

            Kp = b2(K)
            vR_p = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
            vR_p[:K] = vR
            vt_p = np.zeros((Kp, 3), np.float32)
            vt_p[:K] = vt
            vs_p = np.ones(Kp, np.float32)
            vs_p[:K] = vs
            fx_p = np.ones(Kp, bool)
            fx_p[:K] = fixed
            e_i_np = np.asarray(e_i, np.int64)
            e_j_np = np.asarray(e_j, np.int64)
            mR_np = np.stack(mR).astype(np.float32)
            mt_np = np.stack(mt).astype(np.float32)
            ms_np = np.asarray(ms, np.float32)
            ew_np = np.asarray(e_w, np.float32)
            if Kp <= 256:
                Ep = b2(E)
                ei_p = np.zeros(Ep, np.int32)
                ei_p[:E] = e_i_np
                ej_p = np.zeros(Ep, np.int32)
                ej_p[:E] = e_j_np
                mR_p = np.tile(np.eye(3, dtype=np.float32), (Ep, 1, 1))
                mR_p[:E] = mR_np
                mt_p = np.zeros((Ep, 3), np.float32)
                mt_p[:E] = mt_np
                ms_p = np.ones(Ep, np.float32)
                ms_p[:E] = ms_np
                ew_p = np.zeros(Ep, np.float32)
                ew_p[:E] = ew_np
                ev_p = np.zeros(Ep, bool)
                ev_p[:E] = True
                R_out, t_out, s_out, cost = pose_graph.optimize_sim3_graph(
                    jnp.asarray(vR_p), jnp.asarray(vt_p), jnp.asarray(vs_p),
                    jnp.asarray(fx_p),
                    jnp.asarray(ei_p), jnp.asarray(ej_p),
                    jnp.asarray(mR_p), jnp.asarray(mt_p),
                    jnp.asarray(ms_p),
                    jnp.asarray(ew_p), jnp.asarray(ev_p),
                    n_iters=20,
                )
            else:
                # banded path: orient every edge i<j (Sim3-inverting the
                # swapped measurements), split by slot distance into the
                # tridiagonal band (d <= g) and the long-range Woodbury
                # set (loop edges + revisit covisibility)
                g_sn = 8
                swap = e_i_np > e_j_np
                ei2 = np.where(swap, e_j_np, e_i_np).astype(np.int32)
                ej2 = np.where(swap, e_i_np, e_j_np).astype(np.int32)
                inv_s = 1.0 / ms_np
                Rt = np.swapaxes(mR_np, 1, 2)
                mt_inv = -inv_s[:, None] * np.einsum(
                    "nij,nj->ni", Rt, mt_np)
                mR2 = np.where(swap[:, None, None], Rt, mR_np)
                mt2 = np.where(swap[:, None], mt_inv, mt_np)
                ms2 = np.where(swap, inv_s, ms_np)
                dslot = ej2 - ei2
                in_band = dslot <= g_sn
                n_long = int((~in_band).sum())
                if n_long > 256:
                    # rank cap: uniform-stride the long set (rare; a graph
                    # this loopy is better served by the dense solver)
                    keep = np.zeros(len(ei2), bool)
                    keep[in_band] = True
                    li = np.nonzero(~in_band)[0]
                    keep[li[np.linspace(0, len(li) - 1, 256).astype(
                        np.int64)]] = True
                    ei2, ej2 = ei2[keep], ej2[keep]
                    mR2, mt2, ms2 = mR2[keep], mt2[keep], ms2[keep]
                    ew2 = ew_np[keep]
                    in_band = (ej2 - ei2) <= g_sn
                else:
                    ew2 = ew_np

                def padgrp(mask, lo):
                    n = int(mask.sum())
                    cap = b2(max(n, 1)) if max(n, 1) > lo else lo
                    out_i = np.zeros(cap, np.int32)
                    out_j = np.zeros(cap, np.int32)
                    out_j[:] = 1  # padding edges must satisfy j-i in [1,g]
                    oR = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
                    ot = np.zeros((cap, 3), np.float32)
                    os_ = np.ones(cap, np.float32)
                    ow = np.zeros(cap, np.float32)
                    ov = np.zeros(cap, bool)
                    out_i[:n] = ei2[mask]
                    out_j[:n] = ej2[mask]
                    oR[:n] = mR2[mask]
                    ot[:n] = mt2[mask]
                    os_[:n] = ms2[mask]
                    ow[:n] = ew2[mask]
                    ov[:n] = True
                    return (jnp.asarray(out_i), jnp.asarray(out_j),
                            jnp.asarray(oR), jnp.asarray(ot),
                            jnp.asarray(os_), jnp.asarray(ow),
                            jnp.asarray(ov))

                band_grp = padgrp(in_band, 64)
                long_grp = padgrp(~in_band, 16)
                R_out, t_out, s_out, cost = \
                    pose_graph.optimize_sim3_graph_banded(
                        jnp.asarray(vR_p), jnp.asarray(vt_p),
                        jnp.asarray(vs_p), jnp.asarray(fx_p),
                        *band_grp, *long_grp, g=g_sn, n_iters=20)
        R_out = np.asarray(R_out)[:K]
        t_out = np.asarray(t_out)[:K]
        s_out = np.asarray(s_out)[:K]
        # correct all landmarks via an observing keyframe's graph delta —
        # one vectorized ownership pass (first observer in valid order,
        # like the serial loop it replaces) + batched Sim3 transport
        pre_R, pre_t, pre_s = vR, vt, vs
        obs = store.kf_kp_mp[valid]                      # (K, C)
        wi, ki = np.nonzero(obs >= 0)
        ids_all = obs[wi, ki]
        keep = store.mp_valid[ids_all]
        wi, ids_all = wi[keep], ids_all[keep]
        order = np.argsort(ids_all, kind="stable")       # stable: first
        ids_s, wi_s = ids_all[order], wi[order]          # observer wins
        ids_u, first = np.unique(ids_s, return_index=True)
        owner = wi_s[first]                              # (M,) KF slot
        pos = store.mp_pos[ids_u]
        p_cam = (pre_s[owner, None]
                 * np.einsum("nij,nj->ni", pre_R[owner], pos)
                 + pre_t[owner])
        s_inv = 1.0 / s_out[owner]
        p_new = s_inv[:, None] * np.einsum(
            "nji,nj->ni", R_out[owner],
            p_cam - t_out[owner])
        store.mp_pos[ids_u] = p_new.astype(np.float32)
        store.kf_R[valid] = R_out.astype(np.float32)
        store.kf_t[valid] = (t_out / s_out[:, None]).astype(np.float32)

        store.loop_edges.append((cand, kf))
        self.last_loop_kf = kf
        self.n_loops_closed += 1
        store.big_change_idx += 1
        store.correction_epoch += 1

        # ---- global BA: dispatched async, overlapped with tracking (the
        # reference's detached stoppable GBA thread, LoopClosing.cc:645) --
        self._global_ba(kf)

    def _fuse_loop_points(self, kf: int, loop_points):
        store = self.store
        cam = self.cfg.camera
        cap = 4096
        ids = loop_points[:cap]
        n = len(ids)
        ids_p = np.pad(ids, (0, cap - n), constant_values=0)
        pval = np.zeros(cap, bool)
        pval[:n] = store.mp_valid[ids]
        uv, z, ok = device_ops.project_points(
            jnp.asarray(store.kf_R[kf]), jnp.asarray(store.kf_t[kf]),
            jnp.asarray(store.mp_pos[ids_p]),
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)
        idx, _ = device_ops.match_projected(
            uv, ok & jnp.asarray(pval), jnp.asarray(store.mp_desc[ids_p]),
            jnp.asarray(store.kf_kp_xy[kf]),
            jnp.asarray(store.kf_kp_octave[kf]),
            jnp.asarray(store.kf_kp_valid[kf]),
            unpack_bits_to_pm1(jnp.asarray(store.kf_desc[kf])),
            jnp.full(cap, 4.0, jnp.float32), None, max_dist_th=matcher.TH_LOW)
        idx = np.asarray(idx)
        fi = np.nonzero(idx >= 0)[0]
        if len(fi) == 0:
            return
        mp_new = ids_p[fi]
        tgt = idx[fi].astype(np.int64)
        alive = store.mp_valid[mp_new]
        existing = store.kf_kp_mp[kf, tgt]
        ex_dead = (existing < 0) | ~store.mp_valid[existing.clip(0)]
        add = alive & ex_dead
        store.add_observations(kf, tgt[add], mp_new[add])
        merge = np.nonzero(alive & ~ex_dead & (existing != mp_new))[0]
        for m in merge:
            a, b = int(existing[m]), int(mp_new[m])
            if store.mp_valid[a] and store.mp_valid[b]:
                store.replace_point(a, b)

    def _global_ba(self, loop_kf: int, iters: int = 10):
        """GlobalBundleAdjustemnt(WithBirdview) after a loop
        (`RunGlobalBundleAdjustment`, LoopClosing.cc:645-758).

        Two rounds: bundle_adjust re-classifies outliers between its two LM
        phases and re-qualifies edges at exit, so the second round starts
        with the cross-seam observations (fused loop points) that the first
        round's early iterations rejected while the seam residuals were
        still large. One round from a fresh loop correction reliably stalls
        in a local minimum; two rounds converge (measured on the circular
        loop-closure scenario: ATE 0.22 after one round, 0.011 after two)."""
        half = (iters // 2, iters - iters // 2)
        self.mapper._gba_iters = half
        self.mapper._gba_rounds_left = 1        # second round chained on landing
        self.mapper.global_ba(iters=half, async_dispatch=True)
