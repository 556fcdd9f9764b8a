"""Descriptor options beyond BRIEF: ORB (steered BRIEF) and a
FREAK-style retina descriptor.

Parity targets: the reference's descriptor factory offers
BRIEF/BRISK/ORB/FREAK/SIFT/SURF (src/tracker.cpp:36-97 via OpenCV).
The binary family maps cleanly to TPU (bilinear gathers + packed
uint32 compare bits, same Hamming ops as frontend/brief.py); the
float family (SIFT/SURF) is intentionally out — the reference's
shipped configs use FAST+BRIEF.

* ORB = oriented BRIEF: patch orientation from the intensity centroid
  (Rublee et al. 2011), BRIEF pair pattern rotated by that angle. (The
  learned rBRIEF pair de-correlation is not reproduced; the steered
  sampling is the part that matters for rotation invariance.)
* FREAK-style: retina sampling — a center point plus concentric rings
  of receptive fields, coarse-to-fine pair comparisons (Alahi et al.
  2012). Per-field Gaussian kernels are approximated by sampling the
  globally pre-smoothed image at the field center plus a small ring
  average for the outer (larger) fields; orientation reuses the
  intensity-centroid estimate.

All extractors return (8,) uint32 = 256 bits, interchangeable with
brief.hamming / hamming_matrix.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import brief

# descriptor kind ids (config `tracker_cfg.descriptor`)
BRIEF, ORB, FREAK, BRISK = 0, 1, 2, 3
KINDS = {"brief": BRIEF, "orb": ORB, "freak": FREAK, "brisk": BRISK}


def _disc_offsets(radius=15, step=3):
    ys, xs = np.mgrid[-radius:radius + 1:step, -radius:radius + 1:step]
    m = xs ** 2 + ys ** 2 <= radius ** 2
    return np.stack([xs[m], ys[m]], axis=1).astype(np.float32)


_DISC = _disc_offsets()


def _orientation_from_patch(patch, center):
    """Intensity-centroid orientation sampled in-patch (no gathers)."""
    from .image import patch_bilinear_points
    offs = jnp.asarray(_DISC)
    vals = patch_bilinear_points(patch, center[None, :] + offs)
    m10 = jnp.sum(vals * offs[:, 0])
    m01 = jnp.sum(vals * offs[:, 1])
    return jnp.arctan2(m01, m10)


def orientation(img_smooth, xy):
    """Intensity-centroid patch orientation (ORB, Rublee et al. §3.2)."""
    from .image import extract_patch
    S = 2 * 17 + 1
    cx = jnp.round(xy[0]).astype(jnp.int32)
    cy = jnp.round(xy[1]).astype(jnp.int32)
    patch = extract_patch(img_smooth, cx, cy, S)
    center = xy - (jnp.stack([cx, cy]).astype(img_smooth.dtype) - S // 2)
    return _orientation_from_patch(patch, center)


def extract_orb(img_smooth, xy):
    """Steered-BRIEF descriptor at one keypoint (vmap over keypoints).

    One shared patch serves the orientation disc and the rotated pattern
    (max rotated extent = 15*sqrt(2) ~ 21.3 px); all sampling is 2-hot
    in-patch matmuls (gather-free).
    """
    from .image import extract_patch, patch_bilinear_points
    S = 2 * 23 + 1
    cx = jnp.round(xy[0]).astype(jnp.int32)
    cy = jnp.round(xy[1]).astype(jnp.int32)
    patch = extract_patch(img_smooth, cx, cy, S)
    center = xy - (jnp.stack([cx, cy]).astype(img_smooth.dtype) - S // 2)
    th = _orientation_from_patch(patch, center)
    c, s = jnp.cos(th), jnp.sin(th)
    R = jnp.array([[c, -s], [s, c]])
    pat = jnp.asarray(brief.PATTERN)                   # (256, 4)
    rel = jnp.concatenate([pat[:, 0:2], pat[:, 2:4]], axis=0) @ R.T
    vals = patch_bilinear_points(patch, center[None, :] + rel)
    bits = (vals[:256] < vals[256:]).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.reshape(8, 32) << shifts[None, :], axis=1,
                   dtype=jnp.uint32)


def _retina(n_rings=7, per_ring=6, r_max=15.0):
    """(43, 3) retina fields: (x, y, field radius)."""
    pts = [(0.0, 0.0, 1.0)]
    for ri in range(n_rings):
        r = r_max * (ri + 1) / n_rings
        size = 0.5 + 1.5 * (ri + 1) / n_rings
        phase = (ri % 2) * np.pi / per_ring
        for k in range(per_ring):
            a = 2 * np.pi * k / per_ring + phase
            pts.append((r * np.cos(a), r * np.sin(a), size))
    return np.asarray(pts, np.float32)


_RETINA = _retina()


def _freak_pairs(n_pairs=256, seed=3):
    """Deterministic coarse-to-fine pair selection over the 43 fields:
    prefer pairs spanning adjacent rings (the published FREAK learns its
    512 pairs from data; this fixed choice keeps the coarse-to-fine
    structure)."""
    n = _RETINA.shape[0]
    rng = np.random.default_rng(seed)
    cand = [(i, j) for i in range(n) for j in range(i + 1, n)]
    d = np.asarray([np.hypot(*( _RETINA[i, :2] - _RETINA[j, :2]))
                    for i, j in cand])
    order = np.argsort(-d)          # coarse (long-range) pairs first
    take = list(order[: n_pairs // 2])
    rest = order[n_pairs // 2:]
    take += list(rng.permutation(rest)[: n_pairs - len(take)])
    return np.asarray([cand[k] for k in take], np.int32)


_FREAK_PAIRS = _freak_pairs()
_RING4 = np.asarray(
    [[1.0, 0], [0, 1.0], [-1.0, 0], [0, -1.0]], np.float32)


def extract_freak(img_smooth, xy):
    """FREAK-style retina descriptor at one keypoint (gather-free)."""
    from .image import extract_patch, patch_bilinear_points
    S = 2 * 20 + 1          # retina radius 15 + max field size 2 + slack
    cx = jnp.round(xy[0]).astype(jnp.int32)
    cy = jnp.round(xy[1]).astype(jnp.int32)
    patch = extract_patch(img_smooth, cx, cy, S)
    center = xy - (jnp.stack([cx, cy]).astype(img_smooth.dtype) - S // 2)
    th = _orientation_from_patch(patch, center)
    c, s = jnp.cos(th), jnp.sin(th)
    R = jnp.array([[c, -s], [s, c]])
    ret = jnp.asarray(_RETINA)
    centers = center[None, :] + ret[:, :2] @ R.T         # (43, 2)
    # receptive field = center sample + 4-point ring average at the
    # field radius (approximates the per-field Gaussian)
    ring = jnp.asarray(_RING4)
    samp = centers[:, None, :] + ring[None, :, :] * ret[:, 2, None, None]
    pts = jnp.concatenate([centers[:, None, :], samp], axis=1)  # (43,5,2)
    vals = patch_bilinear_points(patch, pts.reshape(-1, 2)).reshape(43, 5)
    field = jnp.mean(vals, axis=1)                        # (43,)
    pairs = jnp.asarray(_FREAK_PAIRS)
    bits = (field[pairs[:, 0]] < field[pairs[:, 1]]).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.reshape(8, 32) << shifts[None, :], axis=1,
                   dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# BRISK (Leutenegger et al., ICCV 2011): concentric-ring sampling
# pattern; LONG-distance pairs vote the orientation (gradient sum),
# SHORT-distance pairs give the bits; the pattern rotates by the
# estimated angle. Differences from the published form, chosen for the
# shared 256-bit uint32x8 format (interchangeable with brief.hamming):
# the 256 shortest of the short-distance pairs are used (published:
# ~512 at its scale unit), and per-point Gaussian smoothing is
# approximated by a center sample + 4-point ring average at radius
# sigma, like the FREAK fields above.
# ---------------------------------------------------------------------------

def _brisk_pattern():
    """(60, 3) sampling points: (x, y, sigma). Center + 4 rings at the
    published radii/counts (BRISK paper Fig. 4 proportions)."""
    radii = [0.0, 2.9, 4.9, 7.4, 10.8]
    counts = [1, 10, 14, 15, 20]
    pts = []
    for ring, (r, n) in enumerate(zip(radii, counts)):
        sigma = 0.5 + 0.25 * ring
        phase = (ring % 2) * np.pi / max(n, 1)
        for k in range(n):
            a = 2 * np.pi * k / n + phase
            pts.append((r * np.cos(a), r * np.sin(a), sigma))
    return np.asarray(pts, np.float32)


_BRISK = _brisk_pattern()


def _brisk_pairs():
    """(short_pairs (256, 2), long_pairs (L, 2)) by the published
    distance thresholds delta_max=9.75, delta_min=13.67."""
    n = _BRISK.shape[0]
    cand = [(i, j) for i in range(n) for j in range(i + 1, n)]
    d = np.asarray([np.hypot(*(_BRISK[i, :2] - _BRISK[j, :2]))
                    for i, j in cand])
    short = [cand[k] for k in np.argsort(d) if d[k] < 9.75][:256]
    long_ = [cand[k] for k in range(len(cand)) if d[k] > 13.67]
    return (np.asarray(short, np.int32), np.asarray(long_, np.int32))


_BRISK_SHORT, _BRISK_LONG = _brisk_pairs()


def extract_brisk(img_smooth, xy):
    """BRISK descriptor at one keypoint (vmap over keypoints)."""
    from .image import extract_patch, patch_bilinear_points
    S = 2 * 16 + 1           # pattern radius 10.8 + field ring + rotation
    cx = jnp.round(xy[0]).astype(jnp.int32)
    cy = jnp.round(xy[1]).astype(jnp.int32)
    patch = extract_patch(img_smooth, cx, cy, S)
    center = xy - (jnp.stack([cx, cy]).astype(img_smooth.dtype) - S // 2)

    pat = jnp.asarray(_BRISK)
    ring = jnp.asarray(_RING4)

    def fields(R):
        centers = center[None, :] + pat[:, :2] @ R.T
        samp = centers[:, None, :]             + ring[None, :, :] * pat[:, 2, None, None]
        pts = jnp.concatenate([centers[:, None, :], samp], axis=1)
        vals = patch_bilinear_points(patch, pts.reshape(-1, 2))
        return jnp.mean(vals.reshape(-1, 5), axis=1)          # (60,)

    # orientation from the unrotated long pairs (paper eq. 3):
    # g = mean over long pairs of (p_j - p_i) (I_j - I_i)/||p_j-p_i||^2
    f0 = fields(jnp.eye(2, dtype=patch.dtype))
    lp = jnp.asarray(_BRISK_LONG)
    dxy = pat[lp[:, 1], :2] - pat[lp[:, 0], :2]
    dI = f0[lp[:, 1]] - f0[lp[:, 0]]
    g = jnp.sum(dxy * (dI / jnp.sum(dxy * dxy, axis=1))[:, None], axis=0)
    th = jnp.arctan2(g[1], g[0])
    c, s = jnp.cos(th), jnp.sin(th)
    R = jnp.array([[c, -s], [s, c]])

    f = fields(R)
    sp = jnp.asarray(_BRISK_SHORT)
    bits = (f[sp[:, 0]] < f[sp[:, 1]]).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.reshape(8, 32) << shifts[None, :], axis=1,
                   dtype=jnp.uint32)


def extract(kind: int, img_smooth, xy):
    """Static dispatch on the descriptor kind (jit-time constant)."""
    if kind == ORB:
        return extract_orb(img_smooth, xy)
    if kind == FREAK:
        return extract_freak(img_smooth, xy)
    if kind == BRISK:
        return extract_brisk(img_smooth, xy)
    return brief.extract(img_smooth, xy)
