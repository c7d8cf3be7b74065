"""Vocabulary, keyframe database, and Sim3 pose-graph tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.frontend.keypoints import unpack_bits_to_pm1
from orbslam_birdview_tpu.graph import pose_graph
from orbslam_birdview_tpu.mapping import vocab as V


def rand_desc(rng, n):
    u8 = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    return np.asarray(unpack_bits_to_pm1(jnp.asarray(u8)))


def perturb(desc_pm1, rng, bits=12):
    out = desc_pm1.copy()
    for i in range(len(out)):
        flip = rng.choice(256, bits, replace=False)
        out[i, flip] *= -1
    return out


def test_vocab_train_and_word_stability(rng):
    desc = rand_desc(rng, 3000)
    voc = V.train_vocabulary(desc, branching=6, depth=3, seed=0)
    assert voc.n_words == 216
    d = jnp.asarray(desc[:200])
    valid = jnp.ones(200, bool)
    bow1, w1, nodes1 = V.transform(voc, d, valid)
    # same descriptors -> same words; slightly perturbed -> mostly same
    d2 = jnp.asarray(perturb(desc[:200], rng, bits=8))
    _, w2, _ = V.transform(voc, d2, valid)
    same = (np.asarray(w1) == np.asarray(w2)).mean()
    assert same > 0.6, f"word stability {same}"
    # bow is L1-normalized
    np.testing.assert_allclose(float(jnp.sum(bow1)), 1.0, atol=1e-5)


def test_vocab_scoring_discriminates(rng):
    desc = rand_desc(rng, 3000)
    voc = V.train_vocabulary(desc, branching=8, depth=4, seed=0)
    a = desc[:150]
    b = perturb(a, rng, bits=10)          # same place, noisy
    c = rand_desc(rng, 150)               # different place
    val = jnp.ones(150, bool)
    bow_a, _, _ = V.transform(voc, jnp.asarray(a), val)
    bow_b, _, _ = V.transform(voc, jnp.asarray(b), val)
    bow_c, _, _ = V.transform(voc, jnp.asarray(c), val)
    s_same = float(V.l1_score(bow_a, bow_b))
    s_diff = float(V.l1_score(bow_a, bow_c))
    assert s_same > 2 * s_diff, (s_same, s_diff)


def test_vocab_save_load(tmp_path, rng):
    desc = rand_desc(rng, 1000)
    voc = V.train_vocabulary(desc, branching=4, depth=2, seed=0)
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = V.Vocabulary.load(p)
    d = jnp.asarray(desc[:50])
    _, w1, _ = V.transform(voc, d, jnp.ones(50, bool))
    _, w2, _ = V.transform(voc2, d, jnp.ones(50, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_sim3_pose_graph_closes_loop(rng):
    """Odometry chain with scale drift + one loop edge: the essential-graph
    optimization must pull the end of the loop back to the start."""
    K = 20
    # ground truth: circle
    gt = []
    for k in range(K):
        th = 2 * np.pi * k / K
        Rk = np.asarray(lie.so3_exp(jnp.asarray([0, 0, th], dtype=jnp.float32)))
        pk = np.array([np.cos(th), np.sin(th), 0.0], np.float32) * 5
        R_cw = Rk.T
        t_cw = -R_cw @ pk
        gt.append((R_cw, t_cw))
    # odometry with noise + scale drift: estimated poses accumulate error
    est_R = [gt[0][0]]
    est_t = [gt[0][1]]
    est_s = [1.0]
    drift = 1.015  # 1.5% scale drift per step
    for k in range(1, K):
        R_prev, t_prev = gt[k - 1]
        R_k, t_k = gt[k]
        # true relative: T_k * T_{k-1}^-1
        R_rel = R_k @ R_prev.T
        t_rel = t_k - R_rel @ t_prev
        t_rel = t_rel * (drift ** k) + rng.normal(0, 0.01, 3).astype(np.float32)
        R_e = R_rel @ est_R[-1]
        t_e = R_rel @ est_t[-1] + t_rel
        est_R.append(R_e)
        est_t.append(t_e)
        est_s.append(1.0)
    est_R = jnp.asarray(np.stack(est_R))
    est_t = jnp.asarray(np.stack(est_t))
    est_s = jnp.ones(K)

    # edges: consecutive odometry (from estimated relative poses — consistent
    # with the drifted estimates) + loop edge K-1 -> 0 with TRUE relative
    e_i, e_j, mR, mt, ms = [], [], [], [], []
    for k in range(1, K):
        # measurement maps i=k-1 into j=k: S_ji = S_j S_i^-1 (estimated)
        Ri, ti = np.asarray(est_R[k - 1]), np.asarray(est_t[k - 1])
        Rj, tj = np.asarray(est_R[k]), np.asarray(est_t[k])
        Rr = Rj @ Ri.T
        tr = tj - Rr @ ti
        e_i.append(k - 1); e_j.append(k)
        mR.append(Rr); mt.append(tr); ms.append(1.0)
    # loop edge: true relative between KF K-1 and KF 0
    R0, t0 = gt[0]
    R1, t1 = gt[K - 1]
    Rr = R0 @ R1.T
    tr = t0 - Rr @ t1
    e_i.append(K - 1); e_j.append(0)
    mR.append(Rr); mt.append(tr); ms.append(1.0)

    E = len(e_i)
    R_out, t_out, s_out, cost = pose_graph.optimize_sim3_graph(
        est_R, est_t, est_s,
        jnp.zeros(K, bool).at[0].set(True),
        jnp.asarray(np.array(e_i, np.int32)), jnp.asarray(np.array(e_j, np.int32)),
        jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
        jnp.asarray(np.array(ms, np.float32)),
        jnp.ones(E), jnp.ones(E, bool), n_iters=30,
    )
    # What the essential graph guarantees (and what the reference gets from
    # OptimizeEssentialGraph): the loop is CLOSED — the corrected relative
    # pose of (K-1, 0) matches the loop measurement — and total graph error
    # collapses. Exact GT recovery is not available from drifted odometry.
    from orbslam_birdview_tpu.graph import residuals as res_mod

    r_loop_before = res_mod.sim3_relative(
        est_R[K - 1], est_t[K - 1], jnp.float32(1.0),
        est_R[0], est_t[0], jnp.float32(1.0),
        jnp.asarray(Rr), jnp.asarray(tr), jnp.float32(1.0))
    r_loop_after = res_mod.sim3_relative(
        R_out[K - 1], t_out[K - 1], s_out[K - 1],
        R_out[0], t_out[0], s_out[0],
        jnp.asarray(Rr), jnp.asarray(tr), jnp.float32(1.0))
    n_before = float(jnp.linalg.norm(r_loop_before))
    n_after = float(jnp.linalg.norm(r_loop_after))
    assert n_before > 1.0, n_before
    assert n_after < 0.1 * n_before, (n_before, n_after)
    assert float(cost) < 1e-2
    # scale drift absorbed into per-vertex Sim3 scales
    assert np.asarray(s_out).std() > 1e-3


def test_kfdb_reloc_candidates(rng):
    """Keyframe database must retrieve the matching place."""
    from orbslam_birdview_tpu.frontend.keypoints import Keypoints, pack_pm1_to_bits
    from orbslam_birdview_tpu.mapping.kfdb import KeyFrameDatabase
    from orbslam_birdview_tpu.mapping.mapstore import MapStore

    descs = [rand_desc(rng, 128) for _ in range(6)]
    voc = V.train_vocabulary(np.concatenate(descs), branching=6, depth=3)
    store = MapStore(max_kf=16, kp_cap=128)
    db = KeyFrameDatabase(voc, store)

    def mk_kp(d_pm1):
        u8 = np.asarray(pack_pm1_to_bits(jnp.asarray(d_pm1)))
        return Keypoints(
            xy=jnp.zeros((128, 2)), response=jnp.ones(128),
            angle=jnp.zeros(128), octave=jnp.zeros(128, jnp.int32),
            valid=jnp.ones(128, bool), desc_u8=jnp.asarray(u8),
            desc_pm1=jnp.asarray(d_pm1),
        )

    for i, d in enumerate(descs):
        kp = mk_kp(d)
        store.alloc_keyframe(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), i, float(i), kp)
        db.add_keyframe(i, kp)
    # query resembling place 3
    q = mk_kp(perturb(descs[3], rng, bits=10))
    cands = db.detect_relocalization_candidates(q)
    assert 3 in cands, cands


def test_dbow2_text_import(tmp_path):
    """Round-trip a tiny DBoW2 text vocabulary (k=3, L=2, with a short
    branch and an early leaf) and check descent + weights."""
    import jax.numpy as jnp
    from orbslam_birdview_tpu.frontend.keypoints import unpack_bits_to_pm1
    from orbslam_birdview_tpu.mapping import vocab as V

    # hierarchical descriptors: children are small perturbations of their
    # parent (random descriptors would not respect the tree structure)
    descs = np.zeros((9, 32), np.uint8)
    descs[1, :] = 0x00
    descs[2, :] = 0xFF
    descs[3, :] = 0x0F
    descs[4] = descs[1].copy(); descs[4, 0] = 0x01
    descs[5] = descs[1].copy(); descs[5, 1] = 0x03
    descs[6] = descs[1].copy(); descs[6, 2] = 0x07
    descs[7] = descs[2].copy(); descs[7, 0] = 0xFE
    descs[8] = descs[2].copy(); descs[8, 1] = 0xF8

    def line(parent, is_leaf, d, w):
        return f"{parent} {int(is_leaf)} " + " ".join(
            str(int(b)) for b in d) + f" {w}"

    lines = ["3 2 0 0"]
    # level 1: children of root — node 3 is an EARLY LEAF (word above L)
    lines.append(line(0, 0, descs[1], 0.0))   # id 1
    lines.append(line(0, 0, descs[2], 0.0))   # id 2
    lines.append(line(0, 1, descs[3], 0.7))   # id 3, early leaf
    # level 2: node 1 has 3 children, node 2 only 2 (short branch)
    lines.append(line(1, 1, descs[4], 0.4))   # id 4
    lines.append(line(1, 1, descs[5], 0.5))   # id 5
    lines.append(line(1, 1, descs[6], 0.6))   # id 6
    lines.append(line(2, 1, descs[7], 0.8))   # id 7
    lines.append(line(2, 1, descs[8], 0.9))   # id 8
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")

    voc = V.load_dbow2_text(str(p))
    assert voc.branching == 3 and voc.depth == 2 and voc.n_words == 9

    # descend each leaf descriptor: must land on a word carrying its weight
    for nid, want_w in [(4, 0.4), (5, 0.5), (6, 0.6), (7, 0.8), (8, 0.9),
                        (3, 0.7)]:
        pm1 = unpack_bits_to_pm1(jnp.asarray(descs[nid][None]))
        bow, word, nodes = V.transform(voc, pm1, jnp.ones(1, bool))
        w = float(np.asarray(voc.weights)[int(word[0])])
        assert abs(w - want_w) < 1e-6, (nid, w, want_w)
    # distinct leaves -> distinct words
    words = []
    for nid in (4, 5, 6, 7, 8, 3):
        pm1 = unpack_bits_to_pm1(jnp.asarray(descs[nid][None]))
        _, word, _ = V.transform(voc, pm1, jnp.ones(1, bool))
        words.append(int(word[0]))
    assert len(set(words)) == 6, words


def test_dbow2_binary_import(tmp_path):
    """Write the same tiny vocabulary in the fork's binary format
    (TemplatedVocabulary.h:1512-1533 layout) and check it imports
    identically to the text loader."""
    import struct

    import jax.numpy as jnp
    from orbslam_birdview_tpu.frontend.keypoints import unpack_bits_to_pm1
    from orbslam_birdview_tpu.mapping import vocab as V

    descs = np.zeros((9, 32), np.uint8)
    descs[1, :] = 0x00
    descs[2, :] = 0xFF
    descs[3, :] = 0x0F
    descs[4] = descs[1].copy(); descs[4, 0] = 0x01
    descs[5] = descs[1].copy(); descs[5, 1] = 0x03
    descs[6] = descs[1].copy(); descs[6, 2] = 0x07
    descs[7] = descs[2].copy(); descs[7, 0] = 0xFE
    descs[8] = descs[2].copy(); descs[8, 1] = 0xF8
    nodes = [  # (parent, descriptor, weight, is_leaf) in creation order
        (0, descs[1], 0.0, 0), (0, descs[2], 0.0, 0), (0, descs[3], 0.7, 1),
        (1, descs[4], 0.4, 1), (1, descs[5], 0.5, 1), (1, descs[6], 0.6, 1),
        (2, descs[7], 0.8, 1), (2, descs[8], 0.9, 1),
    ]
    buf = struct.pack("<IIiiii", len(nodes) + 1, 41, 3, 2, 0, 0)
    for parent, d, w, leaf in nodes:
        buf += struct.pack("<i", parent) + bytes(d) + struct.pack(
            "<f", w) + bytes([leaf])
    p = tmp_path / "voc.bin"
    p.write_bytes(buf)

    voc = V.load_dbow2(str(p))
    assert voc.branching == 3 and voc.depth == 2 and voc.n_words == 9
    for nid, want_w in [(4, 0.4), (5, 0.5), (6, 0.6), (7, 0.8), (8, 0.9),
                        (3, 0.7)]:
        pm1 = unpack_bits_to_pm1(jnp.asarray(descs[nid][None]))
        _, word, _ = V.transform(voc, pm1, jnp.ones(1, bool))
        w = float(np.asarray(voc.weights)[int(word[0])])
        assert abs(w - want_w) < 1e-6, (nid, w, want_w)

    # malformed record size is rejected
    bad = struct.pack("<IIiiii", 3, 17, 3, 2, 0, 0) + b"\x00" * 34
    pb = tmp_path / "bad.bin"
    pb.write_bytes(bad)
    try:
        V.load_dbow2_binary(str(pb))
        assert False, "expected ValueError"
    except ValueError:
        pass
