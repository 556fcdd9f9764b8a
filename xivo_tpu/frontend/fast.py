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
    # suppress boxes around occupied positions: for each occupied point,
    # zero the box. Vectorized: compute for every pixel the min distance
    # in chebyshev metric to occupied points — memory heavy; instead
    # scatter -inf boxes via dynamic updates per occupied point (bounded
    # count, typically <= 200).
    def body(i, sc):
        cx = occupied_xy[i, 0].astype(jnp.int32)
        cy = occupied_xy[i, 1].astype(jnp.int32)
        valid = occupied_valid[i]
        patch = jnp.where(valid, 0.0, 1.0) * jax.lax.dynamic_slice(
            sc, (jnp.clip(cy - half, 0, H - mask_size),
                 jnp.clip(cx - half, 0, W - mask_size)),
            (mask_size, mask_size))
        return jax.lax.dynamic_update_slice(
            sc, patch, (jnp.clip(cy - half, 0, H - mask_size),
                        jnp.clip(cx - half, 0, W - mask_size)))

    score = jax.lax.fori_loop(0, occupied_xy.shape[0], body, score)

    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return xy, vals, vals > 0.0
