"""FAST-9/16 corner detection, fully vectorized over the image.

Replaces cv::FastFeatureDetector (Tracker detector factory,
src/tracker.cpp:36-97). The whole score map is computed with 16 shifted
image views and a contiguous-arc test via bit rotations — no per-pixel
loops, everything fuses on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (x right, y down) — OpenCV's FAST-16 ring
CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
    (-1, -3),
]


def _shift(img, dx, dy):
    """View of img shifted by (dx, dy) with edge padding."""
    H, W = img.shape
    img = jnp.pad(img, 3, mode="edge")
    return img[3 + dy:3 + dy + H, 3 + dx:3 + dx + W]


def fast_score(img, threshold: float = 20.0, arc: int = 9):
    """FAST corner response map (H, W).

    A pixel is a corner if >= `arc` contiguous ring pixels are all
    brighter than center+t or all darker than center-t. The score is the
    min-over-arc of |ring - center| maximized over arcs (the same
    definition OpenCV uses for nonmax suppression), zero for non-corners.
    """
    rings = jnp.stack([_shift(img, dx, dy) for (dx, dy) in CIRCLE])  # (16,H,W)
    diff = rings - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def arc_ok(mask):
        # contiguous run of `arc` around the 16-ring: AND of rotations
        out = jnp.zeros_like(mask[0], dtype=bool)
        for start in range(16):
            run = mask[start]
            for k in range(1, arc):
                run = run & mask[(start + k) % 16]
            out = out | run
        return out

    is_corner = arc_ok(brighter) | arc_ok(darker)

    # score: max over arcs of (min over the arc of |diff| - threshold)
    adiff = jnp.abs(diff)
    best = jnp.zeros_like(img)
    for start in range(16):
        m = adiff[start]
        for k in range(1, arc):
            m = jnp.minimum(m, adiff[(start + k) % 16])
        best = jnp.maximum(best, m)
    return jnp.where(is_corner, best, 0.0)


# AGAST 7/12d ring: diamond of radius 2-3 (the "d" pattern of
# cv::AgastFeatureDetector AGAST_7_12d, reference detector factory
# src/tracker.cpp:36-97)
DIAMOND12 = [
    (0, -3), (1, -2), (2, -1), (3, 0), (2, 1), (1, 2),
    (0, 3), (-1, 2), (-2, 1), (-3, 0), (-2, -1), (-1, -2),
]


def agast_score(img, threshold: float = 20.0, arc: int = 7):
    """AGAST-7/12d corner response map (H, W).

    Same segment-test criterion as FAST but on the 12-pixel diamond
    ring with a 7-contiguous arc — the AGAST_7_12d pattern. (OpenCV's
    AGAST accelerates the DECISION TREE per pixel; on TPU the whole
    map is a fused stencil, so only the ring/arc geometry matters.)
    """
    n = len(DIAMOND12)
    rings = jnp.stack([_shift(img, dx, dy) for (dx, dy) in DIAMOND12])
    diff = rings - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def arc_ok(mask):
        out = jnp.zeros_like(mask[0], dtype=bool)
        for start in range(n):
            run = mask[start]
            for k in range(1, arc):
                run = run & mask[(start + k) % n]
            out = out | run
        return out

    is_corner = arc_ok(brighter) | arc_ok(darker)
    adiff = jnp.abs(diff)
    best = jnp.zeros_like(img)
    for start in range(n):
        m = adiff[start]
        for k in range(1, arc):
            m = jnp.minimum(m, adiff[(start + k) % n])
        best = jnp.maximum(best, m)
    return jnp.where(is_corner, best, 0.0)


def shi_tomasi_score(img, block: int = 3):
    """GFTT/Shi-Tomasi min-eigenvalue response (detector alternative)."""
    from .image import scharr, blur3
    gx, gy = scharr(img)
    Ixx, Iyy, Ixy = gx * gx, gy * gy, gx * gy
    # box filter via repeated blur3 (block=3 -> one pass)
    for _ in range(max(block // 2, 1)):
        Ixx, Iyy, Ixy = blur3(Ixx), blur3(Iyy), blur3(Ixy)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    return tr / 2 - disc


def nms3(score):
    """3x3 non-maximum suppression."""
    H, W = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    neigh = jnp.stack([p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
                      for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                      if not (dx == 0 and dy == 0)])
    return jnp.where(score >= neigh.max(axis=0), score, 0.0)


def select_topk(score, k: int, margin: int, occupied_xy, occupied_valid,
                mask_size: int):
    """Top-k corners with border margin + occupancy suppression.

    The masked-detection discipline of Tracker::MaskOut
    (src/tracker.cpp:760-774): a (2*mask_size//2)^2 box around each live
    track is excluded. Returns (xy (k,2) float, score (k,), valid (k,)).
    """
    H, W = score.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    ok = (xs >= margin) & (xs < W - margin) & (ys >= margin) \
        & (ys < H - margin)
    score = jnp.where(ok, score, 0.0)

    half = mask_size // 2
    # suppress boxes around occupied positions (Tracker::MaskOut). One
    # scatter builds an occupancy image of ALL live tracks, then a
    # separable Chebyshev max-dilation grows each seed into its
    # (2*half+1)^2 box — fully parallel. (The previous per-point
    # dynamic-slice loop ran its N_table iterations SEQUENTIALLY — a
    # measured multi-ms latency chain under batch vmap.)
    cx = jnp.clip(occupied_xy[:, 0].astype(jnp.int32), 0, W - 1)
    cy = jnp.clip(occupied_xy[:, 1].astype(jnp.int32), 0, H - 1)
    occ = jnp.zeros((H, W), jnp.float32).at[
        jnp.where(occupied_valid, cy, H), cx].max(1.0, mode="drop")

    def shift(x, s, axis):
        # zero-fill shift (roll would wrap masks across the border)
        pad = [(0, 0), (0, 0)]
        pad[axis] = (max(s, 0), max(-s, 0))
        xp2 = jnp.pad(x, pad)
        sl = [slice(None), slice(None)]
        sl[axis] = slice(max(-s, 0), xp2.shape[axis] - max(s, 0))
        return xp2[tuple(sl)]

    def dilate1d(x, r, axis):
        # log-step max-dilation: after reach R the support is [-R, R];
        # a further shift by s <= 2R+1 keeps it contiguous
        R = 0
        while R < r:
            s = min(2 * R + 1, r - R)
            x = jnp.maximum(x, jnp.maximum(shift(x, s, axis),
                                           shift(x, -s, axis)))
            R += s
        return x

    occ = dilate1d(dilate1d(occ, half, 0), half, 1)
    score = jnp.where(occ > 0, 0.0, score)

    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return xy, vals, vals > 0.0


def harris_score(img, k: float = 0.04, block: int = 3):
    """Harris corner measure det(M) - k tr(M)^2 (cv::cornerHarris)."""
    from .image import scharr, blur3
    gx, gy = scharr(img)
    Ixx, Iyy, Ixy = gx * gx, gy * gy, gx * gy
    for _ in range(max(block // 2, 1)):
        Ixx, Iyy, Ixy = blur3(Ixx), blur3(Iyy), blur3(Ixy)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    return det - k * tr * tr


def ofast_score(img, threshold: float = 20.0):
    """ORB's oFAST detection response: FAST-positive pixels RANKED by
    the Harris measure (Rublee et al. 2011 §3.1 — FAST gives
    candidates, Harris orders them; the 'o' orientation lives in the
    steered descriptor, frontend/descriptors.py::extract_orb).
    Parity anchor: the reference's ORB detector option,
    src/tracker.cpp:36-97."""
    f = fast_score(img, threshold)
    h = harris_score(img)
    # positive ranking values only where FAST fires (shift Harris up
    # so valid responses are > 0 regardless of its sign)
    return jnp.where(f > 0.0, h - h.min() + 1e-3, 0.0)


def brisk_score(img, threshold: float = 20.0):
    """BRISK-style detection response: AGAST corners that persist
    across scale. The published detector searches AGAST maxima in a
    continuous scale-space octave stack (Leutenegger et al. 2011 §3.1);
    the TPU-native redesign scores the base image AND its half-scale
    (2x2-mean) downsample, upsamples the coarse map, and keeps the
    elementwise MINIMUM — a corner must respond at both scales, which
    is the scale-persistence test without the per-keypoint subpixel
    scale fit (the filter's subpixel refinement happens in LK anyway).
    """
    s0 = agast_score(img, threshold)
    H, W = img.shape
    h2, w2 = H // 2, W // 2
    img2 = img[:2 * h2, :2 * w2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
    s1 = agast_score(img2, threshold)
    up = jnp.repeat(jnp.repeat(s1, 2, axis=0), 2, axis=1)
    up = jnp.pad(up, ((0, H - 2 * h2), (0, W - 2 * w2)))
    return jnp.minimum(s0, up)
