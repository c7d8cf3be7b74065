import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.frontend import matcher, orb
from orbslam_birdview_tpu.frontend.keypoints import unpack_bits_to_pm1


@pytest.fixture(scope="module")
def test_image(rng=None):
    """Procedural textured image with corners."""
    r = np.random.default_rng(7)
    img = (r.uniform(0, 60, size=(240, 320))).astype(np.float32)
    # add blocks/corners
    for _ in range(40):
        y, x = r.integers(20, 200), r.integers(20, 280)
        h, w = r.integers(8, 30), r.integers(8, 30)
        img[y : y + h, x : x + w] += r.uniform(60, 180)
    img = cv2.GaussianBlur(np.clip(img, 0, 255), (3, 3), 0.8)
    return np.clip(img, 0, 255).astype(np.float32)


def test_fast_mask_matches_opencv(test_image):
    """Our FAST-9/16 corner mask must agree with cv2 (no NMS)."""
    t = 20
    det = cv2.FastFeatureDetector_create(
        threshold=t, nonmaxSuppression=False, type=cv2.FastFeatureDetector_TYPE_9_16
    )
    kps = det.detect(test_image.astype(np.uint8), None)
    cv_mask = np.zeros(test_image.shape, dtype=bool)
    for k in kps:
        cv_mask[int(round(k.pt[1])), int(round(k.pt[0]))] = True

    _, corner = orb.fast_response(jnp.asarray(test_image.astype(np.uint8).astype(np.float32)), float(t))
    ours = np.asarray(corner)
    # ignore 3px border (cv2 skips it)
    b = 3
    cv_in = cv_mask[b:-b, b:-b]
    ours_in = ours[b:-b, b:-b]
    disagreement = np.sum(cv_in != ours_in)
    assert disagreement == 0, f"{disagreement} disagreeing pixels of {cv_in.size}"


def test_gaussian_blur_matches_opencv(test_image):
    ours = np.asarray(orb.gaussian_blur7(jnp.asarray(test_image)))
    ref = cv2.GaussianBlur(test_image, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_brief_descriptor_matches_opencv(test_image):
    """Feed identical keypoints+angles to cv2.ORB.compute and to our BRIEF;
    descriptors must agree except for a small fraction of borderline bits
    (float vs integer blur rounding)."""
    img_u8 = test_image.astype(np.uint8)
    det = cv2.FastFeatureDetector_create(threshold=25, nonmaxSuppression=True)
    kps = det.detect(img_u8, None)
    kps = [k for k in kps if 25 < k.pt[0] < 295 and 25 < k.pt[1] < 215][:50]
    assert len(kps) >= 20
    # compute orientation ourselves, then give cv2 the same angles
    xs = jnp.asarray([int(round(k.pt[0])) for k in kps], dtype=jnp.int32)
    ys = jnp.asarray([int(round(k.pt[1])) for k in kps], dtype=jnp.int32)
    imgf = jnp.asarray(img_u8.astype(np.float32))
    ang = np.asarray(orb.ic_angle(imgf, ys, xs))
    for k, a in zip(kps, ang):
        k.angle = float(np.degrees(a))
        k.octave = 0
        k.pt = (float(round(k.pt[0])), float(round(k.pt[1])))
    extractor = cv2.ORB_create(nlevels=1, edgeThreshold=0)
    kps_out, desc_cv = extractor.compute(img_u8, kps)
    assert desc_cv is not None and len(kps_out) == len(kps)

    blur = orb.gaussian_blur7(imgf)
    ours = np.asarray(orb.brief_descriptors(blur, ys, xs, jnp.asarray(ang)))
    # hamming distance between ours and cv2's, per keypoint
    ham = np.array(
        [bin(int.from_bytes(bytes(np.bitwise_xor(a, b)), "little")).count("1")
         for a, b in zip(ours, desc_cv)]
    )
    # allow a few borderline bits (blur rounding); typical is 0-6 of 256
    assert np.median(ham) <= 8, f"median hamming {np.median(ham)}, max {ham.max()}"
    assert np.mean(ham) <= 16


def test_ic_angle_matches_opencv_orientation(test_image):
    """cv2.ORB detect computes IC angles; ours at same locations must agree."""
    img_u8 = test_image.astype(np.uint8)
    extractor = cv2.ORB_create(nfeatures=100, nlevels=1, edgeThreshold=31, fastThreshold=25)
    kps = extractor.detect(img_u8, None)
    kps = [k for k in kps if k.octave == 0][:40]
    assert len(kps) >= 10
    xs = jnp.asarray([int(round(k.pt[0])) for k in kps], dtype=jnp.int32)
    ys = jnp.asarray([int(round(k.pt[1])) for k in kps], dtype=jnp.int32)
    ours = np.degrees(np.asarray(orb.ic_angle(jnp.asarray(img_u8.astype(np.float32)), ys, xs)))
    ref = np.array([k.angle for k in kps])
    diff = np.abs(((ours - ref) + 180) % 360 - 180)
    assert np.median(diff) < 2.0, f"median angle diff {np.median(diff)}"


def test_extract_orb_end_to_end(test_image):
    cfg = orb.ORBConfig(n_features=500, n_levels=4)
    kp = orb.extract_orb(jnp.asarray(test_image), cfg)
    n = int(kp.count())
    assert n >= 300, f"only {n} keypoints"
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    assert xy[:, 0].min() >= 0 and xy[:, 1].min() >= 0
    # spatial spread: at least 15 distinct 32px cells occupied
    cells = set(map(tuple, (xy // 32).astype(int)))
    assert len(cells) >= 15
    # multiple octaves present
    octs = set(np.asarray(kp.octave)[np.asarray(kp.valid)].tolist())
    assert len(octs) >= 2


def test_hamming_matrix_paths_agree(rng):
    a = rng.integers(0, 256, size=(64, 32)).astype(np.uint8)
    b = rng.integers(0, 256, size=(96, 32)).astype(np.uint8)
    d_pop = np.asarray(matcher.hamming_matrix_popcount(jnp.asarray(a), jnp.asarray(b)))
    pa = unpack_bits_to_pm1(jnp.asarray(a))
    pb = unpack_bits_to_pm1(jnp.asarray(b))
    d_mxu = np.asarray(matcher.hamming_matrix(pa, pb))
    np.testing.assert_array_equal(d_pop, d_mxu)
    # oracle for one pair
    d00 = bin(int.from_bytes(bytes(np.bitwise_xor(a[0], b[0])), "little")).count("1")
    assert d_pop[0, 0] == d00


def test_match_mutual_basic():
    # 4 descriptors, b = permuted a with 1-bit noise
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(4, 32)).astype(np.uint8)
    perm = np.array([2, 0, 3, 1])
    b = a[perm].copy()
    b[0, 0] ^= 1  # one bit flip
    pa = unpack_bits_to_pm1(jnp.asarray(a))
    pb = unpack_bits_to_pm1(jnp.asarray(b))
    dist = matcher.hamming_matrix(pa, pb)
    idx, d = matcher.match_mutual(dist, max_dist=50, ratio=0.9)
    idx = np.asarray(idx)
    # a[i] should match b[j] where perm[j] == i
    expect = np.argsort(perm)
    np.testing.assert_array_equal(idx, expect)


def test_resolve_duplicate_targets():
    idx = jnp.asarray(np.array([3, 3, 2, -1, 3], dtype=np.int32))
    score = jnp.asarray(np.array([10, 5, 7, 99, 5], dtype=np.int32))
    out = np.asarray(matcher.resolve_duplicate_targets(idx, score))
    # target 3 claimed by sources 1 and 4 with score 5 — lowest source wins
    np.testing.assert_array_equal(out, [-1, 3, 2, -1, -1])


def test_search_by_projection_window():
    # map point projects near keypoint 1 only
    proj = jnp.asarray(np.array([[50.0, 50.0]], dtype=np.float32))
    kxy = jnp.asarray(np.array([[10.0, 10.0], [52.0, 49.0], [80.0, 80.0]], dtype=np.float32))
    rng = np.random.default_rng(3)
    desc = rng.integers(0, 256, size=(3, 32)).astype(np.uint8)
    pdesc = desc[1:2].copy()
    kpm = unpack_bits_to_pm1(jnp.asarray(desc))
    ppm = unpack_bits_to_pm1(jnp.asarray(pdesc))
    idx, d = matcher.search_by_projection(
        proj,
        jnp.ones(1, bool),
        ppm,
        kxy,
        jnp.zeros(3, jnp.int32),
        jnp.ones(3, bool),
        kpm,
        jnp.asarray(np.array([5.0], np.float32)),
    )
    assert int(idx[0]) == 1 and int(d[0]) == 0


def test_stereo_subpixel_disparity():
    """Subpixel SAD refinement must recover a known fractional disparity
    to well under half a pixel (Frame::ComputeStereoMatches parabola,
    src/Frame.cc:748-818)."""
    from orbslam_birdview_tpu.frontend import stereo

    rng = np.random.default_rng(7)
    H, W = 64, 256
    # smooth random texture so SAD has a clean minimum
    base = rng.uniform(0, 255, (H, W + 32)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(np.convolve, ax, base, k, mode="same")
    gt_disp = 7.4
    xs = np.arange(W, dtype=np.float32)
    img_l = base[:, 16:16 + W]
    # right image: uR = uL − disp ⇒ img_r(x) = img_l(x + disp) (linear interp)
    x_src = xs + 16 + gt_disp
    x0 = np.floor(x_src).astype(int)
    a = (x_src - x0).astype(np.float32)
    img_r = base[:, x0] * (1 - a) + base[:, x0 + 1] * a

    K = 8
    xy_l = np.stack([rng.uniform(20, W - 20, K), rng.uniform(10, H - 10, K)],
                    1).astype(np.float32)
    ur0 = np.round(xy_l[:, 0] - gt_disp)  # integer-pixel initial match
    uR, sad, ok = stereo.subpixel_disparity(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.asarray(xy_l),
        jnp.asarray(ur0, jnp.float32), jnp.ones(K, bool))
    uR, ok = np.asarray(uR), np.asarray(ok)
    assert ok.all()
    disp = np.round(xy_l[:, 0]) - uR
    err = np.abs(disp - gt_disp)
    # integer matching alone is ±0.5; the parabola must do much better
    assert err.max() < 0.45 and err.mean() < 0.2, err
