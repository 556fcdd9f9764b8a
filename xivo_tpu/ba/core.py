"""Bundle adjustment: Schur-complement Levenberg-Marquardt.

The TPU-native replacement for the reference's g2o backend
(src/optimizer.{h,cpp}, src/optimizer_types.h: SE3 GroupVertex +
Vec3 FeatureVertex + calibrated reprojection edges, LM with
cholmod/csparse). Redesign rationale (SURVEY §2.5/§2.6):

* The problem ships as dense fixed-capacity tables — K keyframe poses,
  Lm landmarks, an (Lm, K) observation mask + normalized-plane
  measurements — the same masked-adjacency layout the filter uses.
* Each LM iteration builds all residuals/Jacobians with one vmap over
  (landmark, keyframe) pairs, reduces the landmark blocks locally
  (3x3 inversions), and forms the reduced camera system
  S = U - W V^-1 W^T densely: for sliding-window scales (K <= 64) a
  dense (6K, 6K) Cholesky on the MXU beats any sparse factorization.
* The landmark axis is embarrassingly partitionable: the distributed
  version (dist/ba.py) shards landmarks across devices and psums S and
  b — the Schur reduction over collectives named in the north star.

Observations use normalized camera coordinates (the reference's
optimizer_adapters.cpp:10-54 also feeds camera-frame unprojected
coords), so the camera model drops out of the backend.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geom import so3


class BAProblem(NamedTuple):
    Rs: jnp.ndarray     # (K,3,3) world->cam? No: cam pose g_wc: R,T map cam->world
    Ts: jnp.ndarray     # (K,3)
    Xs: jnp.ndarray     # (Lm,3) landmarks (world)
    obs: jnp.ndarray    # (Lm,K,2) normalized-plane measurements
    mask: jnp.ndarray   # (Lm,K) bool
    fixed: jnp.ndarray  # (K,) bool — gauge-fixed poses (first pose)


def _residual_jac(R, T, X):
    """Residual chain for one (pose, landmark): world -> cam -> plane.

    Pose is cam-to-world (R, T); Xc = R^T (X - T).
    Returns (xn (2,), J_pose (2,6) [w, t], J_point (2,3)).
    """
    Xc = R.T @ (X - T)
    z = Xc[2]
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    xn = Xc[:2] / zs
    dxn_dXc = jnp.array([[1.0 / zs, 0.0, -Xc[0] / (zs * zs)],
                         [0.0, 1.0 / zs, -Xc[1] / (zs * zs)]])
    # right-multiplicative pose perturbation: R <- R exp(w), T <- T + dt
    dXc_dw = so3.hat(Xc)          # d(R exp(w))^T(X-T)/dw = hat(Xc)
    dXc_dt = -R.T
    dXc_dX = R.T
    return xn, front, dxn_dXc @ dXc_dw, dxn_dXc @ dXc_dt, dxn_dXc @ dXc_dX


def _build_normal_eq(p: BAProblem, huber_thresh: float):
    """All residual blocks + Huber weights in one vmap sweep."""
    Lm, K = p.mask.shape

    def per_pair(l, k):
        xn, front, Jw, Jt, Jx = _residual_jac(p.Rs[k], p.Ts[k], p.Xs[l])
        r = xn - p.obs[l, k]
        use = p.mask[l, k] & front
        # Huber: w = min(1, delta/|r|)
        nrm = jnp.linalg.norm(r) + 1e-12
        w = jnp.where(nrm > huber_thresh, huber_thresh / nrm, 1.0)
        w = w * use.astype(r.dtype)
        Jp = jnp.concatenate([Jw, Jt], axis=1)       # (2,6)
        return r * w, Jp * w, Jx * w, use, (nrm ** 2) * use

    ls = jnp.arange(Lm)
    ks = jnp.arange(K)
    f = jax.vmap(jax.vmap(per_pair, in_axes=(None, 0)), in_axes=(0, None))
    r, Jp, Jx, use, chi2 = f(ls, ks)   # (Lm,K,...) leading dims
    return r, Jp, Jx, use, chi2


def chi2_only(p: BAProblem, huber_thresh: float):
    """(total chi2, active-observation count) at p — residual-only sweep
    (no Jacobians), used by the LM accept/reject test. chi2 matches
    _build_normal_eq's definition (raw squared norm of used residuals,
    not Huber-weighted). The count is part of the accept test: chi2
    sums only mask & front pairs, so a step that pushes a landmark
    behind a camera would silently DROP its (possibly large) residual
    from chi2_try — comparing counts rejects such steps (advisor r4
    finding #1)."""
    def per_pair(l, k):
        Xc = p.Rs[k].T @ (p.Xs[l] - p.Ts[k])
        z = Xc[2]
        front = z > 1e-6
        xn = Xc[:2] / jnp.where(front, z, 1.0)
        r = xn - p.obs[l, k]
        use = p.mask[l, k] & front
        nrm = jnp.linalg.norm(r) + 1e-12
        return (nrm ** 2) * use, use
    Lm, K = p.mask.shape
    f = jax.vmap(jax.vmap(per_pair, in_axes=(None, 0)), in_axes=(0, None))
    chi2, use = f(jnp.arange(Lm), jnp.arange(K))
    return jnp.sum(chi2), jnp.sum(use.astype(jnp.int32))


# LM accept hysteresis: a step must beat the current chi2 by this
# RELATIVE margin. Keeps the accept decision away from the fp-noise
# boundary so the psum'd distributed solver (whose reduction order
# differs from the single-device sum) takes the SAME accept/reject
# path as ba.core.solve (advisor r4 finding #2); steps improving chi2
# by <0.001% are rejected, which cannot affect convergence.
ACCEPT_MARGIN = 1e-5


def ba_iteration(p: BAProblem, damping, huber_thresh: float):
    """One damped GN step at fixed lambda. Returns (stepped problem,
    chi2 at the INPUT p). `damping` may be a traced scalar."""
    Lm, K = p.mask.shape
    dtype = p.Xs.dtype
    r, Jp, Jx, use, chi2 = _build_normal_eq(p, huber_thresh)
    total_chi2 = jnp.sum(chi2)

    # blocks
    U = jnp.einsum("lkri,lkrj->kij", Jp, Jp)            # (K,6,6)
    V = jnp.einsum("lkri,lkrj->lij", Jx, Jx)            # (Lm,3,3)
    W = jnp.einsum("lkri,lkrj->lkij", Jp, Jx)           # (Lm,K,6,3)
    bp = -jnp.einsum("lkri,lkr->ki", Jp, r)             # (K,6)
    bl = -jnp.einsum("lkri,lkr->li", Jx, r)             # (Lm,3)

    lam = damping
    V = V + lam * jnp.eye(3, dtype=dtype)[None]
    Vinv = jnp.linalg.inv(V)                            # (Lm,3,3)

    # Schur: S = U_full - sum_l W_l Vinv_l W_l^T  (cross-pose terms!)
    WVi = jnp.einsum("lkij,ljm->lkim", W, Vinv)         # (Lm,K,6,3)
    S_red = jnp.einsum("lkim,lqjm->kiqj", WVi, W)       # (K,6,K,6)
    S = jnp.zeros((K, 6, K, 6), dtype)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        U + lam * jnp.eye(6, dtype=dtype)[None])
    S = (S - S_red).reshape(6 * K, 6 * K)
    b = (bp - jnp.einsum("lkim,lm->ki", WVi, bl)).reshape(6 * K)

    # gauge: zero rows/cols of fixed poses, unit diagonal
    fixvec = jnp.repeat(p.fixed, 6)
    keep = (~fixvec).astype(dtype)
    S = S * keep[:, None] * keep[None, :] \
        + jnp.diag(fixvec.astype(dtype))
    b = b * keep

    c, lower = jax.scipy.linalg.cho_factor(S, lower=True)
    dp = jax.scipy.linalg.cho_solve((c, lower), b).reshape(K, 6)

    # back-substitute landmarks: dl = Vinv (bl - W^T dp)
    Wtdp = jnp.einsum("lkij,ki->lj", W, dp)             # (Lm,3)
    dl = jnp.einsum("lij,lj->li", Vinv, bl - Wtdp)

    Rs = jax.vmap(lambda R, w: so3.project(R @ so3.exp(w)))(p.Rs,
                                                            dp[:, :3])
    Ts = p.Ts + dp[:, 3:]
    # only observed landmarks move
    seen = jnp.any(p.mask, axis=1)
    Xs = p.Xs + dl * seen[:, None].astype(dtype)
    return p._replace(Rs=Rs, Ts=Ts, Xs=Xs), total_chi2


def solve(p: BAProblem, iters: int = 10, damping: float = 1e-4,
          huber_thresh: float = 1e9) -> Tuple[BAProblem, jnp.ndarray]:
    """Adaptive Levenberg-Marquardt; returns (problem, chi2 history
    (iters,), the chi2 at each iteration's INPUT point).

    Mirrors Optimizer::Solve (src/optimizer.cpp:140-162) in its fixed
    iteration budget, but with real LM lambda control: each step is
    ACCEPTED only if it reduces total chi2 (lambda /= 2), otherwise the
    parameters are kept and lambda *= 10. A fixed-damping GN loop
    diverged in-stream on keyframe-dense maps (measured: chi2 +5e5 on
    one refine_map call, which corrupted the map and through loop
    closure the filter — scripts/run_longhorizon_mapped.py); with
    rejection the history is monotone non-increasing by construction.
    """
    dtype = p.Xs.dtype
    lam0 = jnp.asarray(damping, dtype)

    def body(carry, _):
        p, lam = carry
        p_try, chi2_cur = ba_iteration(p, lam, huber_thresh)
        chi2_try, n_try = chi2_only(p_try, huber_thresh)
        _, n_cur = chi2_only(p, huber_thresh)
        # accept requires: real chi2 decrease (with hysteresis margin,
        # see ACCEPT_MARGIN) AND no active observations lost (a dropped
        # front=False pair removes its residual from chi2_try)
        accept = (chi2_try < chi2_cur * (1.0 - ACCEPT_MARGIN)) \
            & (n_try >= n_cur)
        p_next = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), p_try, p)
        lam_next = jnp.where(accept,
                             jnp.maximum(lam * 0.5, 1e-9),
                             jnp.minimum(lam * 10.0, 1e6))
        return (p_next, lam_next.astype(dtype)), chi2_cur

    (p, _), hist = jax.lax.scan(body, (p, lam0), None, length=iters)
    return p, hist
