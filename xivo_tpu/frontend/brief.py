"""BRIEF-256 descriptors as packed uint32 words + Hamming distance.

Replaces cv::xfeatures2d::BriefDescriptorExtractor and the reference's
FastBrief popcount ops (src/fastbrief.{h,cpp}). The sampling pattern is
a fixed seeded Gaussian pair set (the standard BRIEF construction);
descriptors are 8 x uint32 = 256 bits; distance = XOR + popcount, which
maps to integer VPU ops and batches over whole tables.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_BITS = 256
N_WORDS = 8
PATCH_RADIUS = 15  # BRIEF-32 uses a 31x31 smoothed patch


def _pattern(seed=17):
    """(256, 4) sampling pairs (x1, y1, x2, y2), isotropic Gaussian,
    sigma = patch/5 (Calonder et al.), clipped into the patch."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_RADIUS * 2 / 5.0
    p = rng.normal(0.0, sigma, size=(N_BITS, 4))
    return np.clip(p, -PATCH_RADIUS, PATCH_RADIUS).astype(np.float32)


PATTERN = _pattern()


def extract(img_smooth, xy):
    """Descriptor at one keypoint xy (2,) on a pre-smoothed image.

    Returns (N_WORDS,) uint32. Callers vmap over keypoints. Sampling is
    gather-free: one patch extraction + in-patch 2-hot bilinear matmuls
    (see image.sample_rel) — traced-index gathers serialize on TPU.
    """
    from .image import sample_rel
    pat = jnp.asarray(PATTERN)
    rel = jnp.concatenate([pat[:, 0:2], pat[:, 2:4]], axis=0)   # (512, 2)
    S = 2 * (PATCH_RADIUS + 2) + 1
    vals = sample_rel(img_smooth, xy, rel, S)
    a, b = vals[:N_BITS], vals[N_BITS:]
    bits = (a < b).astype(jnp.uint32)                      # (256,)
    bits = bits.reshape(N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, :], axis=1, dtype=jnp.uint32)


def hamming(d1, d2):
    """Hamming distance between packed descriptors; broadcasts.

    d1 (..., 8) uint32, d2 (..., 8) uint32 -> (...) int32. The analogue
    of FastBrief::distance's popcount loop (src/fastbrief.h:22-42).
    """
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix(A, B):
    """(N, 8) x (M, 8) -> (N, M) distances (batched XOR+popcount)."""
    return hamming(A[:, None, :], B[None, :, :])
