"""Pyramidal Lucas-Kanade tracking, batched over a track table.

Replaces cv::calcOpticalFlowPyrLK as used by Tracker::UpdateLK
(src/tracker.cpp:463-629): coarse-to-fine translation-only LK with a
fixed iteration budget per level, Scharr template gradients, bilinear
sampling, and the same convergence/validity semantics (eps, window,
max level, border check).

TPU-native formulation: traced-index gathers serialize on TPU, and the
textbook LK inner loop is nothing but gathers (4 per bilinear sample x
window x iterations x levels — measured 214 ms/frame at 512x512 for a
256-track table). Instead, each track's neighborhood is extracted ONCE
per level as an (S, S) patch via separable one-hot selection matmuls
(dense MXU work), and every bilinear sample inside the iteration is a
pair of tiny 2-HOT interpolation matmuls against the patch — the
bilinear weights (1-f, f) folded directly into the selection matrix.
Same math, no gathers anywhere.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops.dense import HIGHEST

# test/debug escape hatch: force the pure-jnp path even on TPU
# (used by the kernel-equivalence check, scripts/check_lk_kernel.py)
_FORCE_JNP = False


def _extract_patches(imgs, cx, cy, S: int):
    """Per-track square patches by separable selection matmuls.

    imgs (C, H, W); cx/cy (N,) int32 patch centers. Returns (C, N, S, S)
    with out-of-image rows/cols border-clamped (matching the bilinear
    border clamp of the gather formulation).
    """
    from .image import sel_einsum
    C, H, W = imgs.shape
    offs = jnp.arange(S, dtype=jnp.int32) - S // 2
    rows = jnp.clip(cy[:, None] + offs[None, :], 0, H - 1)      # (N, S)
    cols = jnp.clip(cx[:, None] + offs[None, :], 0, W - 1)
    Ar = (rows[:, :, None]
          == jnp.arange(H, dtype=jnp.int32)[None, None, :]).astype(imgs.dtype)
    R = sel_einsum("nsh,chw->cnsw", Ar, imgs)                   # (C,N,S,W)
    Ac = (cols[:, :, None]
          == jnp.arange(W, dtype=jnp.int32)[None, None, :]).astype(imgs.dtype)
    return sel_einsum("cnsw,ntw->cnst", R, Ac)                  # (C,N,S,S)


def _patch_bilinear(patch, start, w: int):
    """Bilinear w x w window from each patch at continuous top-left.

    patch (N, S, S) indexed [row, col]; start (N, 2) = (x, y) window
    top-left in patch coordinates. The start clamp here is a numerical
    guard only — _track_level clamps the ITERATE and fails tracks that
    escape the pad margin, so in-range inputs are the invariant.

    TPU shape (round 3): the window is a RIGID translation, so all
    w x w samples of a track share ONE (by, bx, fy, fx). Instead of
    per-track 2-hot selection matmuls — which lower to thousands of
    MXU-starved (w, S) x (S, S) matmuls under batch (measured ~80% of
    the batched image frame) — the integer shift is a sum over the
    S-w+1 possible offsets of STATICALLY-sliced patch views weighted
    by per-track coefficients that fold in the bilinear fractions:

        out = sum_o c_o[n] * patch[n, o:o+w, :]   (rows; c 2-hot in o)
        then the same over columns.

    Pure fusable VPU elementwise work, identical math to the matmul
    form (coefficients are exactly the old Wr/Wc entries).
    """
    N, S, _ = patch.shape
    dt = patch.dtype
    sx = jnp.clip(start[:, 0], 0.0, S - w - 1 + 0.999)
    sy = jnp.clip(start[:, 1], 0.0, S - w - 1 + 0.999)
    bx = jnp.floor(sx)
    by = jnp.floor(sy)
    fx = sx - bx
    fy = sy - by
    no = S - w + 1
    o = jnp.arange(no, dtype=dt)
    # c[n, o] = (1-f)*[b==o] + f*[b==o-1]
    cy = ((by[:, None] == o[None, :]) * (1.0 - fy)[:, None]
          + (by[:, None] == o[None, :] - 1.0) * fy[:, None]).astype(dt)
    cx = ((bx[:, None] == o[None, :]) * (1.0 - fx)[:, None]
          + (bx[:, None] == o[None, :] - 1.0) * fx[:, None]).astype(dt)
    Pr = sum(cy[:, i, None, None] * patch[:, i:i + w, :]
             for i in range(no))                               # (N, w, S)
    return sum(cx[:, j, None, None] * Pr[:, :, j:j + w]
               for j in range(no))                             # (N, w, w)


def _scharr_patches(p):
    """Scharr gradients on (N, S, S) patches (same kernel as
    image.scharr). Edge-padded, so only the 1-px border differs from
    full-image gradients — the LK window stays >= pad-1 >= 1 px inside
    the patch, so the values it reads are identical."""
    dt = p.dtype
    kd = jnp.asarray([-1.0, 0.0, 1.0], dt) / 2.0
    ks = jnp.asarray([3.0, 10.0, 3.0], dt) / 16.0

    def sep(q, krow, kcol):
        z = jnp.pad(q, ((0, 0), (1, 1), (0, 0)), mode="edge")
        q = sum(z[:, i:z.shape[1] - 2 + i] * krow[i] for i in range(3))
        z = jnp.pad(q, ((0, 0), (0, 0), (1, 1)), mode="edge")
        return sum(z[:, :, i:z.shape[2] - 2 + i] * kcol[i]
                   for i in range(3))

    return sep(p, ks, kd), sep(p, kd, ks)


def _track_level(prev_img, next_img, pts_prev, guesses, valid, half: int,
                 pad: int, iters: int, eps: float):
    """One pyramid level of LK for the whole track table.

    Returns (pts (N,2), ok (N,)): ok = usable gradient AND the iterate
    never needed to leave the searchable pad margin around the guess
    (a track whose true correspondence lies beyond the patch cannot be
    measured there — it must FAIL, not return a clamped position that
    would pass the displacement gate with a wrong pixel).
    """
    dt = prev_img.dtype
    w = 2 * half + 1
    S = w + 2 * pad
    # fused Pallas kernels on TPU f32 (ops/lk_pallas.py): whole GN loop
    # + template sampling stay VMEM-resident — every jnp bilinear call
    # at these shapes costs ~0.25 ms through HBM regardless of
    # formulation (measured round 3); the kernel does an iteration in
    # ~75 us for the full batch-x-table
    use_kernel = (not _FORCE_JNP and jax.default_backend() == "tpu"
                  and dt == jnp.float32)

    # template patch; gradients computed in-patch (a third the matmul
    # cost of extracting img+gx+gy channels, same values in the window)
    tcx = jnp.round(pts_prev[:, 0]).astype(jnp.int32)
    tcy = jnp.round(pts_prev[:, 1]).astype(jnp.int32)
    tp = _extract_patches(prev_img[None], tcx, tcy, S)[0]       # (N,S,S)
    gxp, gyp = _scharr_patches(tp)
    torig = jnp.stack([tcx, tcy], axis=1).astype(dt) - S // 2   # (N,2)
    tstart = (pts_prev - half) - torig
    if use_kernel:
        from ..ops.lk_pallas import sample_templates_fn
        T, Gx, Gy = sample_templates_fn(S, w)(tp, gxp, gyp, tstart)
    else:
        T = _patch_bilinear(tp, tstart, w)
        Gx = _patch_bilinear(gxp, tstart, w)
        Gy = _patch_bilinear(gyp, tstart, w)

    gxx = jnp.sum(Gx * Gx, axis=(1, 2))
    gxy = jnp.sum(Gx * Gy, axis=(1, 2))
    gyy = jnp.sum(Gy * Gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    ok_grad = det > 1e-6
    det = jnp.where(ok_grad, det, 1.0)

    # search patch in the next image, centered on the initial guess
    scx = jnp.round(guesses[:, 0]).astype(jnp.int32)
    scy = jnp.round(guesses[:, 1]).astype(jnp.int32)
    sp = _extract_patches(next_img[None], scx, scy, S)[0]
    sorig = jnp.stack([scx, scy], axis=1).astype(dt) - S // 2

    # iterate positions must keep the sampling window inside the patch:
    # pt in [sorig + half, sorig + half + (S - w - 1)] per axis
    lo = sorig + half
    hi = sorig + half + (S - w - 1)

    if use_kernel:
        # fused GN loop (identical done-masked semantics; running the
        # full iteration budget with converged tracks masked is EXACTLY
        # the early-exited result)
        from ..ops.lk_pallas import gn_tracks_fn
        done0f = (~ok_grad | ~valid).astype(dt)
        N = pts_prev.shape[0]
        halff = jnp.full((N,), float(half), dt)
        sc = jnp.stack([
            gxx, gxy, gyy, det,
            halff, halff,
            jnp.full((N,), float(half + S - w - 1), dt),
            jnp.full((N,), float(half + S - w - 1), dt),
            jnp.full((N,), float(eps) ** 2, dt)], axis=1)     # (N, 9)
        pt0 = guesses - sorig                                 # patch coords
        st0 = jnp.stack([done0f, jnp.zeros((N,), dt)], axis=1)
        ptp, st = gn_tracks_fn(S, w, iters)(sp, T, Gx, Gy, sc, pt0, st0)
        return ptp + sorig, ok_grad & ~(st[:, 1] > 0.5)

    UNROLL = 3   # GN steps per while iteration: the loop is LATENCY-
    # bound on TPU (each iteration is a tiny fused kernel + a sync on
    # the batch-global exit cond), so packing 3 done-masked steps per
    # iteration cuts the sequential chain ~3x with IDENTICAL results
    # (done-masked updates are exact no-ops after convergence).

    def cond(carry):
        i, _, done, _ = carry
        return (i < iters) & ~jnp.all(done)

    def gn_step(pt, done, escaped):
        I = _patch_bilinear(sp, (pt - half) - sorig, w)
        r = I - T
        bx = jnp.sum(Gx * r, axis=(1, 2))
        by = jnp.sum(Gy * r, axis=(1, 2))
        dx = (gyy * bx - gxy * by) / det
        dy = (gxx * by - gxy * bx) / det
        step = jnp.stack([dx, dy], axis=1)
        small = jnp.linalg.norm(step, axis=1) < eps
        raw = pt - step
        clamped = jnp.clip(raw, lo, hi)
        hit = jnp.any(raw != clamped, axis=1)
        pt_new = jnp.where(done[:, None], pt, clamped)
        # a track pushed past the pad margin cannot converge here — mark
        # it escaped (-> failed) and stop iterating it
        return pt_new, done | small | hit, escaped | (hit & ~done)

    def body(carry):
        i, pt, done, escaped = carry
        for k in range(UNROLL):
            # per-step budget mask: without it, iters % UNROLL != 0
            # would run up to UNROLL-1 GN steps beyond the configured
            # budget for still-unconverged tracks (advisor r2)
            ok_budget = (i + k) < iters
            pt2, done2, esc2 = gn_step(pt, done, escaped)
            pt = jnp.where(ok_budget, pt2, pt)
            done = jnp.where(ok_budget, done2, done)
            escaped = jnp.where(ok_budget, esc2, escaped)
        return i + UNROLL, pt, done, escaped

    # whole-table early exit: with the filter-predicted initial flow most
    # tracks converge in a handful of iterations, so running the full
    # OpenCV-default 30 wastes 2-3x LK runtime; done-masked updates make
    # the early-exited result EXACTLY equal to the full-budget one.
    # (a vmapped while_loop runs until every batch element's cond is
    # false, so batch mode keeps the same exactness with global exit.)
    # invalid rows start done so stale table entries never block the exit
    done0 = ~ok_grad | ~valid
    _, pt, _, escaped = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), guesses, done0,
                     jnp.zeros_like(ok_grad)))
    return pt, ok_grad & ~escaped


def track(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
          pts, guesses, valid, win_size: int = 15, iters: int = 30,
          eps: float = 0.01, pad: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track points from prev to next through the pyramid.

    pts (N,2) positions in the previous full-res image; guesses (N,2)
    initial estimates in the next image (the filter prediction hook —
    cv::OPTFLOW_USE_INITIAL_FLOW); returns (new_pts (N,2), ok (N,)).
    ``pad`` bounds the per-level refinement the iterations may add on top
    of the pyramid guess (the patch margin).
    """
    half = win_size // 2
    L = len(prev_pyr)
    scale = 2.0 ** (L - 1)
    cur = guesses / scale

    ok_all = valid

    for lvl in range(L - 1, -1, -1):
        s = 2.0 ** lvl
        new_pts, okg = _track_level(prev_pyr[lvl], next_pyr[lvl],
                                    pts / s, cur, valid, half, pad, iters,
                                    eps)
        new_pts = jnp.where(valid[:, None], new_pts, cur)
        ok_all = ok_all & okg
        cur = new_pts * 2.0 if lvl > 0 else new_pts

    H, W = next_pyr[0].shape
    inb = (cur[:, 0] >= half) & (cur[:, 0] < W - half) \
        & (cur[:, 1] >= half) & (cur[:, 1] < H - half)
    return cur, ok_all & inb & valid
