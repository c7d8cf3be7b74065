"""Offline production-vocabulary trainer (VERDICT r4 item 6).

The reference front-loads a pretrained ~1M-word DBoW2 tree before
tracking starts (`/root/reference/src/System.cc:70-83`); until round 4
this engine bootstrapped only a 10^4-word vocabulary from the young
map's own descriptors mid-run. This tool trains a k=10, L=5 (100k-word)
hierarchical k-majority vocabulary from ORB descriptors extracted over a
diverse bank of synthetic textures and commits it as a compact .npz
artifact (`orbslam_birdview_tpu/data/vocab_100k.npz`), which the System
loads by default at construction.

Usage:  python tools/train_vocab.py [--frames 150] [--features 2000]
        [--branching 10] [--depth 5] [--out <path>]

No real dataset ships in this container; descriptors come from the same
renderer the test tier uses (textured-plane homography warps across many
texture seeds, scales and viewpoints), which produces the true BRIEF bit
distribution (the bits are correlated by the fixed 256-pair pattern, not
uniform random). Users with real footage can retrain on it, or load a
stock DBoW2 ORBvoc.txt via `--vocab` in cli/run_slam.py.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--branching", type=int, default=10)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--max-train", type=int, default=300_000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "orbslam_birdview_tpu", "data", "vocab_100k.npz"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from orbslam_birdview_tpu.core.camera import PinholeCamera
    from orbslam_birdview_tpu.frontend import orb
    from orbslam_birdview_tpu.mapping import vocab as V
    from orbslam_birdview_tpu.utils import synth

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    cfg = orb.ORBConfig(n_features=args.features)
    rng = np.random.default_rng(0)
    descs = []
    t0 = time.time()
    n_tex = max(args.frames // 10, 1)
    for f in range(args.frames):
        # a fresh texture every 10 frames; pose varies per frame so the
        # same texture is seen at several scales/orientations (scale and
        # rotation diversity matter for word coverage)
        seed = f // 10
        seq = synth.WallSequence(cam, n_frames=10, step=0.08, push=0.04,
                                 yaw_rate=0.02, seed=seed)
        img, _ = seq.frame(f % 10)
        kp = orb.extract_orb(
            np.clip(img, 0, 255).astype(np.float32), cfg)
        valid = np.asarray(kp.valid)
        d = np.asarray(kp.desc_pm1)[valid]
        descs.append(d.astype(np.int8))
        if (f + 1) % 25 == 0:
            n = sum(len(x) for x in descs)
            print(f"[{f + 1}/{args.frames}] {n} descriptors "
                  f"({time.time() - t0:.0f}s)", flush=True)
    all_d = np.concatenate(descs)
    print(f"extracted {len(all_d)} descriptors from {args.frames} frames "
          f"({n_tex} textures) in {time.time() - t0:.0f}s", flush=True)

    t1 = time.time()
    voc = V.train_vocabulary(all_d, branching=args.branching,
                             depth=args.depth, seed=0,
                             max_train=args.max_train, iters=4)
    print(f"trained {voc.n_words}-word vocabulary "
          f"(k={voc.branching}, L={voc.depth}) in {time.time() - t1:.0f}s",
          flush=True)
    occupied = int((np.asarray(voc.weights) > 0).sum())
    print(f"occupied words: {occupied}/{voc.n_words}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    voc.save(args.out)
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
