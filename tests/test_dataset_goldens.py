"""Golden-file loader tests (VERDICT r4 item 9).

Each fixture below is a BYTE-ACCURATE miniature of the real on-disk
format, transcribed from the format the reference's drivers parse — NOT
written by the loader under test:

- TUM RGB-D `rgb.txt`/`depth.txt`: the real header comment lines and
  `timestamp filename` rows (`mono_tum.cc:LoadImages` skips the first
  three lines; our loader skips `#` comments), 16-bit depth PNGs at
  factor 5000 (`rgbd_tum.cc` / TUM dataset spec).
- KITTI odometry `times.txt`: scientific-notation seconds, one per line
  (`mono_kitti.cc:LoadImages` reads doubles), frames `image_0/%06d.png`.
- EuRoC `data.csv`: `#timestamp [ns],filename` header + CRLF line
  endings as shipped in the real zips (`mono_euroc.cc:LoadImages`).
- fisheye-birdview `associate.txt`: FIVE whitespace fields
  `timestamp x y theta name`, files at `image/ birdview/ mask/` + name
  (`mono_fisheye.cc:LoadDataset`, :171-200), global `mask_new_front.png`
  green>250 front mask (`applyMask` :205-212), origin crop 1900x800 +
  0.5 downsample (:110-116), per-frame BEV mask green<20 binarization
  (`ConvertMaskBirdview` :244-260).
"""
import os

import cv2
import numpy as np

from orbslam_birdview_tpu.cli import datasets

# ---------------------------------------------------------------------------
# TUM RGB-D — verbatim layout from rgbd_dataset_freiburg1_xyz
# ---------------------------------------------------------------------------

TUM_RGB_TXT = """\
# color images
# file: 'rgbd_dataset_freiburg1_xyz.bag'
# timestamp filename
1305031102.175304 rgb/1305031102.175304.png
1305031102.211214 rgb/1305031102.211214.png
1305031102.275326 rgb/1305031102.275326.png
"""

TUM_DEPTH_TXT = """\
# depth maps
# file: 'rgbd_dataset_freiburg1_xyz.bag'
# timestamp filename
1305031102.160407 depth/1305031102.160407.png
1305031102.226738 depth/1305031102.226738.png
1305031102.262886 depth/1305031102.262886.png
"""


def _write_tum(root):
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write(TUM_RGB_TXT)
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write(TUM_DEPTH_TXT)
    for i, ts in enumerate(("1305031102.175304", "1305031102.211214",
                            "1305031102.275326")):
        cv2.imwrite(os.path.join(root, "rgb", f"{ts}.png"),
                    np.full((48, 64), 40 + i, np.uint8))
    for ts, mm in (("1305031102.160407", 5000),      # 1.0 m at factor 5000
                   ("1305031102.226738", 10000),     # 2.0 m
                   ("1305031102.262886", 15000)):    # 3.0 m
        cv2.imwrite(os.path.join(root, "depth", f"{ts}.png"),
                    np.full((48, 64), mm, np.uint16))


def test_tum_mono_golden(tmp_path):
    _write_tum(str(tmp_path))
    recs = list(datasets.load_tum_mono(str(tmp_path)))
    assert len(recs) == 3
    assert abs(recs[0].timestamp - 1305031102.175304) < 1e-6
    assert float(recs[2].img[0, 0]) == 42.0
    assert recs[0].depth is None


def test_tum_rgbd_golden_association(tmp_path):
    """Nearest-timestamp association within 0.02 s, exactly what the TUM
    associate.py tool produces for `rgbd_tum.cc`; 16-bit depth / 5000."""
    _write_tum(str(tmp_path))
    recs = list(datasets.load_tum_rgbd(str(tmp_path)))
    assert len(recs) == 3
    # rgb 102.175304 -> depth 102.160407 (dt 0.0149 < 0.02)
    assert abs(float(recs[0].depth[0, 0]) - 1.0) < 1e-6
    # rgb 102.211214 -> depth 102.226738 (dt 0.0155)
    assert abs(float(recs[1].depth[0, 0]) - 2.0) < 1e-6
    # rgb 102.275326 -> depth 102.262886 (dt 0.0124)
    assert abs(float(recs[2].depth[0, 0]) - 3.0) < 1e-6


def test_tum_rgbd_association_gap_skips(tmp_path):
    """An rgb frame with no depth inside 0.02 s is dropped, like the TUM
    association tool's max_difference cut."""
    _write_tum(str(tmp_path))
    # push the middle depth timestamp out of the association window
    txt = TUM_DEPTH_TXT.replace("1305031102.226738", "1305031102.826738")
    with open(os.path.join(str(tmp_path), "depth.txt"), "w") as f:
        f.write(txt)
    os.rename(os.path.join(str(tmp_path), "depth",
                           "1305031102.226738.png"),
              os.path.join(str(tmp_path), "depth",
                           "1305031102.826738.png"))
    recs = list(datasets.load_tum_rgbd(str(tmp_path)))
    assert len(recs) == 2


# ---------------------------------------------------------------------------
# KITTI odometry — verbatim times.txt (scientific notation)
# ---------------------------------------------------------------------------

KITTI_TIMES_TXT = """\
0.000000e+00
1.038947e-01
2.077893e-01
"""


def test_kitti_golden(tmp_path):
    for d in ("image_0", "image_1"):
        os.makedirs(str(tmp_path / d))
    (tmp_path / "times.txt").write_text(KITTI_TIMES_TXT)
    for i in range(3):
        cv2.imwrite(str(tmp_path / "image_0" / f"{i:06d}.png"),
                    np.full((48, 64), 10 + i, np.uint8))
        cv2.imwrite(str(tmp_path / "image_1" / f"{i:06d}.png"),
                    np.full((48, 64), 110 + i, np.uint8))
    recs = list(datasets.load_kitti(str(tmp_path), stereo=True))
    assert len(recs) == 3
    assert abs(recs[1].timestamp - 0.1038947) < 1e-9
    assert float(recs[2].img[0, 0]) == 12.0
    assert float(recs[2].right[0, 0]) == 112.0
    mono = list(datasets.load_kitti(str(tmp_path)))
    assert mono[0].right is None


# ---------------------------------------------------------------------------
# EuRoC — verbatim data.csv with CRLF endings (as in the shipped zips)
# ---------------------------------------------------------------------------

def test_euroc_crlf_golden(tmp_path):
    d = tmp_path / "mav0" / "cam0" / "data"
    d.mkdir(parents=True)
    csv = ("#timestamp [ns],filename\r\n"
           "1403636579763555584,1403636579763555584.png\r\n"
           "1403636579813555456,1403636579813555456.png\r\n")
    (tmp_path / "mav0" / "cam0" / "data.csv").write_bytes(csv.encode())
    for i, name in enumerate(("1403636579763555584.png",
                              "1403636579813555456.png")):
        cv2.imwrite(str(d / name), np.full((48, 64), 70 + i, np.uint8))
    recs = list(datasets.load_euroc(str(tmp_path)))
    assert len(recs) == 2
    assert abs(recs[0].timestamp - 1403636579.763555584) < 1e-6
    assert float(recs[1].img[0, 0]) == 71.0


# ---------------------------------------------------------------------------
# fisheye-birdview — verbatim associate.txt (5 fields) + mask semantics
# ---------------------------------------------------------------------------

FISHEYE_ASSOCIATE_TXT = """\
1535697686.000000 0.000000 0.000000 0.000000 0001.jpg
1535697686.040000 0.047321 0.001200 0.010000 0002.jpg
"""


def _write_fisheye(root, front_h=900, front_w=2000):
    os.makedirs(os.path.join(root, "image"))
    os.makedirs(os.path.join(root, "birdview"))
    os.makedirs(os.path.join(root, "mask"))
    with open(os.path.join(root, "associate.txt"), "w") as f:
        f.write(FISHEYE_ASSOCIATE_TXT)
    for i, name in enumerate(("0001.jpg", "0002.jpg")):
        img = np.full((front_h, front_w), 100 + i, np.uint8)
        # marker outside the 1900x800 origin crop: must disappear
        img[850:, 1950:] = 255
        cv2.imwrite(os.path.join(root, "image", name), img)
        cv2.imwrite(os.path.join(root, "birdview", name),
                    np.full((384, 384), 60 + i, np.uint8))
        # BEV mask: 3-channel, green>=20 valid; left half invalid
        m = np.zeros((384, 384, 3), np.uint8)
        m[:, 192:, 1] = 250
        cv2.imwrite(os.path.join(root, "mask", name), m)
    # global front mask: green>250 masks the TOP-LEFT 100x100 block
    fm = np.zeros((front_h, front_w, 3), np.uint8)
    fm[:100, :100, 1] = 255
    cv2.imwrite(os.path.join(root, "mask_new_front.png"), fm)


def test_fisheye_associate_golden(tmp_path):
    _write_fisheye(str(tmp_path))
    recs = list(datasets.load_fisheye_birdview(str(tmp_path)))
    assert len(recs) == 2
    r = recs[0]
    assert abs(r.timestamp - 1535697686.0) < 1e-6
    assert np.allclose(recs[1].odom_pose, [0.047321, 0.0012, 0.01])
    # origin crop 1900x800 then 0.5 downsample -> 400x950
    assert r.img.shape == (400, 950)
    # front mask: green>250 region (top-left 100x100 -> 50x50 after scale)
    assert float(r.img[10, 10]) == 0.0
    assert float(r.img[10, 60]) == 100.0
    # the out-of-crop marker at (850+,1950+) never survives
    assert float(r.img.max()) <= 101.0
    # BEV mask binarization on the green channel: left half invalid
    assert r.bird_mask.shape == (384, 384)
    assert r.bird_mask[100, 10] == 0.0
    assert r.bird_mask[100, 300] == 1.0
    assert float(r.bird[0, 0]) == 60.0


def test_fisheye_no_front_mask(tmp_path):
    """Missing mask_new_front.png: the reference only warns and proceeds
    (`mono_fisheye.cc:56-60`)."""
    _write_fisheye(str(tmp_path))
    os.remove(os.path.join(str(tmp_path), "mask_new_front.png"))
    recs = list(datasets.load_fisheye_birdview(str(tmp_path)))
    assert len(recs) == 2
    assert float(recs[0].img[10, 10]) == 100.0  # nothing masked
