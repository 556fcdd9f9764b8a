"""Pyramidal Lucas-Kanade tracking, vmapped over a track table.

Replaces cv::calcOpticalFlowPyrLK as used by Tracker::UpdateLK
(src/tracker.cpp:463-629): coarse-to-fine translation-only LK with a
fixed iteration budget per level, Scharr template gradients, bilinear
sampling, and the same convergence/validity semantics (eps, window,
max level, border check).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .image import bilinear, patch_coords, scharr


def _track_level(prev_img, next_img, gx, gy, pt_prev, pt_guess, half: int,
                 iters: int, eps: float):
    """One pyramid level of LK for a single point. Returns (pt, ok)."""
    coords_t = patch_coords(pt_prev, half)           # template coords
    T = bilinear(prev_img, coords_t)
    Gx = bilinear(gx, coords_t)
    Gy = bilinear(gy, coords_t)
    # normal matrix of the template gradients
    gxx = jnp.sum(Gx * Gx)
    gxy = jnp.sum(Gx * Gy)
    gyy = jnp.sum(Gy * Gy)
    det = gxx * gyy - gxy * gxy
    ok_grad = det > 1e-6
    det = jnp.where(ok_grad, det, 1.0)

    def body(_, carry):
        pt, done = carry
        coords = patch_coords(pt, half)
        I = bilinear(next_img, coords)
        r = I - T
        bx = jnp.sum(Gx * r)
        by = jnp.sum(Gy * r)
        dx = (gyy * bx - gxy * by) / det
        dy = (gxx * by - gxy * bx) / det
        step = jnp.stack([dx, dy])
        small = jnp.linalg.norm(step) < eps
        pt_new = jnp.where(done, pt, pt - step)
        return pt_new, done | small

    pt, _ = jax.lax.fori_loop(0, iters, body, (pt_guess, ~ok_grad))
    return pt, ok_grad


def track(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
          pts, guesses, valid, win_size: int = 15, iters: int = 30,
          eps: float = 0.01) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track points from prev to next through the pyramid.

    pts (N,2) positions in the previous full-res image; guesses (N,2)
    initial estimates in the next image (the filter prediction hook —
    cv::OPTFLOW_USE_INITIAL_FLOW); returns (new_pts (N,2), ok (N,)).
    """
    half = win_size // 2
    L = len(prev_pyr)
    scale = 2.0 ** (L - 1)
    cur = guesses / scale

    grads = [scharr(p) for p in prev_pyr]
    ok_all = valid

    for lvl in range(L - 1, -1, -1):
        s = 2.0 ** lvl
        gx, gy = grads[lvl]
        prev_l = prev_pyr[lvl]
        next_l = next_pyr[lvl]

        def one(p_prev, p_guess, v):
            pt, okg = _track_level(prev_l, next_l, gx, gy, p_prev, p_guess,
                                   half, iters, eps)
            return jnp.where(v, pt, p_guess), okg

        new_pts, okg = jax.vmap(one)(pts / s, cur, ok_all)
        ok_all = ok_all & okg
        cur = new_pts * 2.0 if lvl > 0 else new_pts

    H, W = next_pyr[0].shape
    inb = (cur[:, 0] >= half) & (cur[:, 0] < W - half) \
        & (cur[:, 1] >= half) & (cur[:, 1] < H - half)
    return cur, ok_all & inb & valid
