"""Image primitives: pyramids, gradients, bilinear sampling.

The substrate for the TPU-native front-end that replaces OpenCV in the
reference's Tracker (src/tracker.cpp). Everything is jnp on (H, W)
float32 images; XLA fuses the small stencils, and the gather-heavy
sampling vectorizes over track batches.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..ops.dense import HIGHEST


def sel_matmul(A, B):
    """Selection-matrix x image-values matmul.

    One-hot / 2-hot selection matrices are EXACT in bfloat16 (entries
    are 0/1 or interpolation fractions), and image intensities carry
    8-bit content — so for float32 inputs this runs one bf16 MXU pass
    (f32 accumulate) instead of the 6-pass HIGHEST decomposition
    (measured: the f32 selection einsums dominated the batched image
    tracker at ~65 ms/frame-batch, B=16, 512x512). Intensity rounding
    is <= 0.5 gray level — below the sensor-noise floor LK already
    tolerates. float64 inputs (x64 CPU tests) keep exact arithmetic.
    """
    if A.dtype == jnp.float32:
        return jnp.matmul(A.astype(jnp.bfloat16), B.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(A, B, precision=HIGHEST)


def sel_einsum(spec, A, B):
    """einsum twin of sel_matmul (same precision contract)."""
    if A.dtype == jnp.float32:
        return jnp.einsum(spec, A.astype(jnp.bfloat16),
                          B.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(spec, A, B, precision=HIGHEST)


def blur3(img):
    """3x3 binomial blur (separable [1 2 1]/4)."""
    k = jnp.asarray([0.25, 0.5, 0.25], img.dtype)
    img = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    img = (img[:-2] * k[0] + img[1:-1] * k[1] + img[2:] * k[2])
    img = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    img = (img[:, :-2] * k[0] + img[:, 1:-1] * k[1] + img[:, 2:] * k[2])
    return img


def blur5(img):
    """5x5 Gaussian-ish blur (separable [1 4 6 4 1]/16) — BRIEF smoothing."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    img = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(img[i:img.shape[0] - 4 + i] * k[i] for i in range(5))
    img = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(img[:, i:img.shape[1] - 4 + i] * k[i] for i in range(5))
    return img


def downsample2(img):
    """Blur + 2x decimation (cv::buildOpticalFlowPyramid level step)."""
    return blur3(img)[::2, ::2]


def build_pyramid(img, levels: int) -> List[jnp.ndarray]:
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def scharr(img):
    """Scharr x/y gradients (the kernel OpenCV LK uses internally)."""
    kd = jnp.asarray([-1.0, 0.0, 1.0], img.dtype) / 2.0
    ks = jnp.asarray([3.0, 10.0, 3.0], img.dtype) / 16.0

    def sep(img, krow, kcol):
        p = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
        img = sum(p[i:p.shape[0] - 2 + i] * krow[i] for i in range(3))
        p = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
        return sum(p[:, i:p.shape[1] - 2 + i] * kcol[i] for i in range(3))

    gx = sep(img, ks, kd)
    gy = sep(img, kd, ks)
    return gx, gy


def bilinear(img, xy):
    """Sample img at continuous (x, y) points; xy (..., 2) in pixel coords.

    Out-of-bounds clamps to the border (callers bound-check separately).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # cast before subtracting: int32 + float32 would promote to f64 under
    # x64 mode and break dtype-stable loops
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * i00 + fx * i01)
            + fy * ((1 - fx) * i10 + fx * i11))


def patch_coords(center, half: int):
    """Integer-lattice patch offsets around a continuous center.

    Returns (2h+1, 2h+1, 2) coordinates center + offset.
    """
    r = jnp.arange(-half, half + 1, dtype=center.dtype)
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([center[0] + ox, center[1] + oy], axis=-1)


def extract_patch(img, cx, cy, S: int):
    """(S, S) patch at integer center (cx, cy) via selection matmuls.

    Gather-free (traced-index gathers serialize on TPU — see
    ARCHITECTURE.md): one-hot row/col selection matrices turn the crop
    into two dense matmuls. Out-of-image rows/cols clamp to the border
    (replicated edge — the same values the border-clamped bilinear
    sampler produces there). vmap over keypoints batches cleanly.
    """
    H, W = img.shape
    offs = jnp.arange(S, dtype=jnp.int32) - S // 2
    rows = jnp.clip(cy + offs, 0, H - 1)
    cols = jnp.clip(cx + offs, 0, W - 1)
    Ar = (rows[:, None]
          == jnp.arange(H, dtype=jnp.int32)[None, :]).astype(img.dtype)
    Ac = (cols[:, None]
          == jnp.arange(W, dtype=jnp.int32)[None, :]).astype(img.dtype)
    return sel_matmul(sel_matmul(Ar, img), Ac.T)


def patch_bilinear_points(patch, pts):
    """Bilinear-sample (P, 2) continuous points (x, y) in patch coords
    from an (S, S) patch — 2-hot interpolation matmuls, no gathers."""
    S = patch.shape[0]
    dt = patch.dtype
    x = jnp.clip(pts[:, 0], 0.0, S - 1.001)
    y = jnp.clip(pts[:, 1], 0.0, S - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    k = jnp.arange(S, dtype=dt)
    Wr = ((k[None, :] == y0[:, None]) * (1.0 - fy)
          + (k[None, :] == y0[:, None] + 1.0) * fy)            # (P, S)
    Wc = ((k[None, :] == x0[:, None]) * (1.0 - fx)
          + (k[None, :] == x0[:, None] + 1.0) * fx)            # (P, S)
    return jnp.sum(jnp.matmul(Wr, patch, precision=HIGHEST) * Wc,
                   axis=1)                                     # (P,)


def sample_rel(img, xy, rel, S: int):
    """``bilinear(img, xy + rel)`` without gathers.

    xy (2,) continuous keypoint; rel (P, 2) offsets with |rel| <=
    S//2 - 1 (the patch radius). One patch extraction + in-patch 2-hot
    sampling; vmap over keypoints.
    """
    cx = jnp.round(xy[0]).astype(jnp.int32)
    cy = jnp.round(xy[1]).astype(jnp.int32)
    patch = extract_patch(img, cx, cy, S)
    base = jnp.stack([cx, cy]).astype(img.dtype) - S // 2
    return patch_bilinear_points(patch, xy[None, :] + rel - base[None, :])
