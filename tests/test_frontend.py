"""Front-end tests on synthetic imagery: FAST, BRIEF, LK, tracker loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.frontend import brief, fast, lk
from xivo_tpu.frontend.image import (bilinear, blur5, build_pyramid)

RNG = np.random.default_rng(3)


def smooth_texture(H=128, W=160, octaves=4):
    """Random multi-scale texture with plenty of gradients."""
    img = np.zeros((H, W))
    for o in range(octaves):
        h, w = H // (2 ** o) + 2, W // (2 ** o) + 2
        layer = RNG.standard_normal((h, w))
        from scipy.ndimage import zoom
        z = zoom(layer, (H / h, W / w), order=3)
        img += z[:H, :W] * (2.0 ** o)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def shift_image(img, dx, dy):
    """Bilinear shift: output(x) = img(x + d)."""
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    coords = jnp.stack([xs + dx, ys + dy], axis=-1)
    return np.asarray(bilinear(jnp.asarray(img), coords)).astype(np.float32)


def test_fast_detects_corner():
    # a bright square on dark background has corners at its 4 vertices
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 200.0
    score = np.asarray(fast.nms3(fast.fast_score(jnp.asarray(img), 20.0)))
    ys, xs = np.nonzero(score)
    assert len(xs) >= 4
    corners = {(20, 20), (20, 39), (39, 20), (39, 39)}
    found = {(y, x) for y, x in zip(ys, xs)}
    # each true corner has a detection within 2px
    for cy, cx in corners:
        assert any(abs(cy - y) <= 2 and abs(cx - x) <= 2 for y, x in found)


def test_fast_flat_region_silent():
    img = jnp.full((64, 64), 100.0)
    assert float(fast.fast_score(img, 20.0).max()) == 0.0


def test_brief_distance():
    img = jnp.asarray(smooth_texture())
    sm = blur5(img)
    p1 = jnp.asarray([50.0, 60.0])
    p2 = jnp.asarray([90.0, 40.0])
    d11 = brief.hamming(brief.extract(sm, p1), brief.extract(sm, p1))
    d12 = brief.hamming(brief.extract(sm, p1), brief.extract(sm, p2))
    assert int(d11) == 0
    assert int(d12) > 40  # different patches differ in many bits


def test_brief_robust_to_small_shift():
    img = jnp.asarray(smooth_texture())
    sm = blur5(img)
    p = jnp.asarray([70.0, 55.0])
    d = brief.hamming(brief.extract(sm, p),
                      brief.extract(sm, p + jnp.asarray([0.5, 0.5])))
    assert int(d) < 60


def test_lk_recovers_translation():
    img0 = smooth_texture()
    true_d = np.array([3.7, -2.2])
    img1 = shift_image(img0, true_d[0], true_d[1])
    pyr0 = build_pyramid(jnp.asarray(img0), 3)
    pyr1 = build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray(RNG.uniform([20, 20], [140, 100], size=(16, 2)),
                      jnp.float32)
    new_pts, ok = lk.track(pyr0, pyr1, pts, pts,
                           jnp.ones(16, bool), win_size=15, iters=30)
    ok = np.asarray(ok)
    assert ok.sum() >= 12
    # output(x) = img0(x+d) => the patch at x in img0 appears at x-d in img1
    flow = np.asarray(new_pts) - np.asarray(pts)
    err = np.linalg.norm(flow[ok] - (-true_d), axis=1)
    assert np.median(err) < 0.3, (np.median(err), flow[ok][:3])


def test_lk_large_motion_via_pyramid():
    img0 = smooth_texture()
    true_d = np.array([14.0, 9.0])
    img1 = shift_image(img0, true_d[0], true_d[1])
    pyr0 = build_pyramid(jnp.asarray(img0), 4)
    pyr1 = build_pyramid(jnp.asarray(img1), 4)
    pts = jnp.asarray(RNG.uniform([30, 30], [120, 90], size=(12, 2)),
                      jnp.float32)
    new_pts, ok = lk.track(pyr0, pyr1, pts, pts,
                           jnp.ones(12, bool), win_size=15, iters=30)
    ok = np.asarray(ok)
    assert ok.sum() >= 8
    flow = np.asarray(new_pts) - np.asarray(pts)
    err = np.linalg.norm(flow[ok] - (-true_d), axis=1)
    assert np.median(err) < 0.5, np.median(err)


def test_select_topk_masks_occupied():
    img = np.zeros((64, 64), np.float32)
    for (y, x) in [(16, 16), (16, 48), (48, 16), (48, 48)]:
        img[y - 3:y + 4, x - 3:x + 4] = 200.0
    score = fast.nms3(fast.fast_score(jnp.asarray(img), 20.0))
    occupied = jnp.asarray([[16.0, 16.0]])
    xy, sc, ok = fast.select_topk(score, 8, margin=4,
                                  occupied_xy=occupied,
                                  occupied_valid=jnp.asarray([True]),
                                  mask_size=15)
    xy = np.asarray(xy)[np.asarray(ok)]
    # nothing detected within the mask box around (16,16)
    assert not np.any((np.abs(xy[:, 0] - 16) <= 7)
                      & (np.abs(xy[:, 1] - 16) <= 7))
    assert len(xy) >= 3


def test_agast_detector_fires_on_texture():
    """AGAST-7/12d (detector breadth parity, src/tracker.cpp:36-97):
    same segment-test family as FAST on the 12-diamond ring."""
    import numpy as np
    from xivo_tpu.frontend.fast import agast_score, nms3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 60, (64, 64)))
    # plant a bright corner blob
    img = img.at[30:34, 30:34].set(220.0)
    sc = nms3(agast_score(img, threshold=20.0))
    ys, xs = np.nonzero(np.asarray(sc) > 0)
    assert len(ys) > 0
    # responses concentrate at the blob corners
    assert (np.abs(ys - 32) <= 4).any() and (np.abs(xs - 32) <= 4).any()
    # a flat image has no corners
    flat = jnp.zeros((64, 64))
    assert float(jnp.max(agast_score(flat, 20.0))) == 0.0
