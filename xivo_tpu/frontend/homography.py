"""Vectorized homography RANSAC for tracker outlier rejection.

Replaces cv::findHomography(RANSAC/LMEDS) as used by
Tracker::OutlierRejection (src/tracker.cpp:705-753): hypothesize
4-point DLT homographies in parallel, score by symmetric transfer
error, and mark correspondences outside the best model as outliers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dlt_h(p0, p1):
    """Homography from 4 correspondences (DLT, SVD of 8x9)."""
    def rows(a, b):
        x, y = a
        u, v = b
        return jnp.array([
            [-x, -y, -1.0, 0.0, 0.0, 0.0, u * x, u * y, u],
            [0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v],
        ])

    A = jnp.concatenate([rows(p0[i], p1[i]) for i in range(4)])
    _, _, vt = jnp.linalg.svd(A)
    H = vt[-1].reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _transfer_err(H, p0, p1):
    q = jnp.concatenate([p0, jnp.ones((p0.shape[0], 1), p0.dtype)], axis=1)
    w = q @ H.T
    z = jnp.where(jnp.abs(w[:, 2:3]) < 1e-9, 1e-9, w[:, 2:3])
    return jnp.linalg.norm(w[:, :2] / z - p1, axis=1)


def homography_ransac(key, p0, p1, valid, n_hyps: int = 64,
                      thresh: float = 3.0, min_inliers: int = 10):
    """Returns (inlier_mask, ok). p0/p1 (N,2) correspondences."""
    N = p0.shape[0]
    keys = jax.random.split(key, n_hyps)

    def one(k):
        r = jax.random.uniform(k, (N,), p0.dtype) + (~valid) * 10.0
        idx = jnp.argsort(r)[:4]
        H = _dlt_h(p0[idx], p1[idx])
        err = _transfer_err(H, p0, p1)
        inl = valid & (err < thresh)
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(one)(keys)
    b = jnp.argmax(counts)
    ok = counts[b] >= min_inliers
    # if the model is unreliable, reject nothing (reference behavior when
    # findHomography fails)
    return jnp.where(ok, inls[b], valid), ok
