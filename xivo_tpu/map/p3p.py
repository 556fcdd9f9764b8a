"""Batched P3P + RANSAC for loop-closure geometric verification.

Replaces the reference's lambdatwist pnp_ransac (thirdparty/pnp, used by
Mapper::DetectLoopClosures, src/mapper.cpp:373-417). Solver: Grunert's
classical formulation — the pairwise-distance quartic solved for all
hypotheses at once via companion-matrix eigenvalues, then absolute
orientation from the 3 recovered camera-frame points. Everything vmaps
over RANSAC hypotheses; no data-dependent control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import so3


def _quartic_roots(c4, c3, c2, c1, c0):
    """Real roots of c4 x^4 + ... + c0 via companion eigenvalues.

    Returns (4,) roots with NaN-free garbage for complex pairs plus a
    validity mask.
    """
    c4s = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    C = jnp.zeros((4, 4), c4.dtype)
    C = C.at[1, 0].set(1.0).at[2, 1].set(1.0).at[3, 2].set(1.0)
    C = C.at[0, 3].set(-c0 / c4s).at[1, 3].set(-c1 / c4s) \
        .at[2, 3].set(-c2 / c4s).at[3, 3].set(-c3 / c4s)
    ev = jnp.linalg.eigvals(C)
    real = jnp.abs(ev.imag) < 1e-6
    return jnp.where(real, ev.real, 1.0), real


def _horn_3pt(Pc, Pw):
    """Rigid transform (R, t) with Pc ~= R Pw + t from 3 correspondences."""
    mc = Pc.mean(axis=0)
    mw = Pw.mean(axis=0)
    W = (Pc - mc).T @ (Pw - mw)
    U, _, Vt = jnp.linalg.svd(W)
    d = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], Pc.dtype)).at[2, 2].set(
        jnp.sign(d))
    R = U @ S @ Vt
    t = mc - R @ mw
    return R, t


def p3p_grunert(Xw, f):
    """P3P: world points Xw (3,3), unit bearings f (3,3) in camera frame.

    Returns (R (4,3,3), t (4,3), valid (4,)) — up to 4 pose hypotheses
    with Xc = R Xw + t.
    """
    a = jnp.linalg.norm(Xw[1] - Xw[2])   # opposite vertex 0
    b = jnp.linalg.norm(Xw[0] - Xw[2])
    c = jnp.linalg.norm(Xw[0] - Xw[1])
    ca = f[1] @ f[2]   # cos(alpha) between rays 1,2
    cb = f[0] @ f[2]
    cc = f[0] @ f[1]

    a2, b2, c2 = a * a, b * b, c * c
    # Grunert's quartic in v (= s2/s1 substitution), standard form
    q = (a2 - c2) / b2
    p = (a2 + c2) / b2
    A4 = (q - 1.0) ** 2 - 4.0 * c2 / b2 * ca * ca
    A3 = 4.0 * (q * (1.0 - q) * cb - (1.0 - p) * ca * cc
                + 2.0 * c2 / b2 * ca * ca * cb)
    A2 = 2.0 * (q * q - 1.0 + 2.0 * q * q * cb * cb + 2.0 * (b2 - c2) / b2
                * ca * ca - 4.0 * p * ca * cb * cc
                + 2.0 * (b2 - a2) / b2 * cc * cc)
    A1 = 4.0 * (-q * (1.0 + q) * cb + 2.0 * a2 / b2 * cc * cc * cb
                - (1.0 - p) * ca * cc)
    A0 = (1.0 + q) ** 2 - 4.0 * a2 / b2 * cc * cc

    v, vok = _quartic_roots(A4, A3, A2, A1, A0)

    def pose_from_v(vi, ok):
        # back-substitute: u from the linear relation, then s1
        den = 1.0 + q - 2.0 * q * vi * vi  # guard
        u = ((-1.0 + q) * vi * vi - 2.0 * q * cb * vi + 1.0 + q) \
            / jnp.where(jnp.abs(2.0 * (cc - vi * ca)) < 1e-9, 1e-9,
                        2.0 * (cc - vi * ca))
        s1sq = b2 / (1.0 + vi * vi - 2.0 * vi * cb)
        good = ok & (s1sq > 1e-9)
        s1 = jnp.sqrt(jnp.maximum(s1sq, 1e-12))
        s2 = u * s1
        s3 = vi * s1
        good = good & (s2 > 0) & (s3 > 0)
        Pc = jnp.stack([s1 * f[0], s2 * f[1], s3 * f[2]])
        R, t = _horn_3pt(Pc, Xw)
        # verify the transform actually reproduces the depths
        res = jnp.linalg.norm((Xw @ R.T + t) - Pc)
        good = good & (res < 1e-3 * (s1 + s2 + s3))
        return R, t, good

    R, t, ok = jax.vmap(pose_from_v)(v, vok)
    return R, t, ok


def pnp_ransac(key, Xw, bearings, valid, n_hyps: int = 64,
               inlier_thresh: float = 0.03, min_inliers: int = 5):
    """Vectorized P3P RANSAC (cf. cvl::pnp_ransac usage in mapper.cpp).

    Xw (N,3) world points; bearings (N,3) unit rays in the camera frame;
    valid (N,) mask. inlier_thresh is angular-ish: the norm of the
    normalized-plane reprojection residual (units of x/z — matching the
    reference's "threshold in px/focal_length"). Returns
    (R, t, inlier_mask, ok) for the best hypothesis: Xc = R Xw + t.
    """
    N = Xw.shape[0]
    dtype = Xw.dtype
    nvalid = jnp.sum(valid.astype(jnp.int32))

    # sample triplets from valid entries: draw indices by perturbed ranks
    keys = jax.random.split(key, n_hyps)

    def one_hyp(k):
        r = jax.random.uniform(k, (N,), dtype) + (~valid) * 10.0
        idx = jnp.argsort(r)[:3]
        R4, t4, ok4 = p3p_grunert(Xw[idx], bearings[idx]
                                  / jnp.linalg.norm(bearings[idx], axis=1,
                                                    keepdims=True))

        def score(R, t, okp):
            Xc = Xw @ R.T + t[None, :]
            z = Xc[:, 2]
            front = z > 1e-6
            zn = jnp.where(front, z, 1.0)
            proj = Xc[:, :2] / zn[:, None]
            meas = bearings[:, :2] / jnp.where(
                jnp.abs(bearings[:, 2:3]) < 1e-9, 1e-9, bearings[:, 2:3])
            err = jnp.linalg.norm(proj - meas, axis=1)
            inl = valid & front & (err < inlier_thresh)
            return jnp.sum(inl.astype(jnp.int32)) * okp, inl

        counts, inls = jax.vmap(score)(R4, t4, ok4)
        best = jnp.argmax(counts)
        return counts[best], R4[best], t4[best], inls[best]

    counts, Rs, ts, inls = jax.vmap(one_hyp)(keys)
    b = jnp.argmax(counts)
    ok = (counts[b] >= min_inliers) & (nvalid >= 3)
    return Rs[b], ts[b], inls[b], ok
