"""Gauss-Newton depth refinement over a feature's observation set.

Port of Feature::RefineDepth (src/feature.cpp:299-460): minimize the
reprojection error of the local state x = (X/Z, Y/Z, log Z) over all
groups that observed the feature (excluding its reference), with
revert-on-worse iterations, a residual-norm acceptance gate, and an
optional Hessian-as-information covariance reset (use_hessian).

Vectorized TPU-style: one feature against the whole group table with an
observation mask; vmapped over the track table by the caller.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from .config import RefinementOptions
from .features import project_persp, unproject_logz


def refine_depth(cam_kind: int, intrin, X, Rsbr, Tsbr, groups_R, groups_T,
                 obs_mask, obs_xp, x0, Psub0, opts: RefinementOptions):
    """Returns (x, Psub, ok).

    obs_mask: (NG,) which group rows observed the feature (ref excluded
    by the caller); obs_xp: (NG, 2) the pixel observations.
    """
    n_obs = jnp.sum(obs_mask.astype(x0.dtype))

    def residuals(x):
        """Stacked masked residuals + normal equations at x."""
        Xc, dXc_dx = unproject_logz(x)
        Rsc = Rsbr @ X.Rbc
        Xs = Rsc @ Xc + Rsbr @ X.Tbc + Tsbr
        dXs_dx = Rsc @ dXc_dx

        def per_group(Rg, Tg, xp, m):
            Rcs = (Rg @ X.Rbc).T
            Xcn = Rcs @ (Xs - (Rg @ X.Tbc + Tg))
            dXcn_dx = Rcs @ dXs_dx
            # guard behind-camera / masked entries
            safe = m & (Xcn[2] > 1e-6)
            Xcn_s = jnp.where(safe, Xcn, jnp.array([0.0, 0.0, 1.0]))
            xcn, dxcn_dXcn = project_persp(Xcn_s)
            xp_pred, dxp_dxcn, _ = cam_mod.project_with_jac(
                cam_kind, intrin, xcn)
            Jr = dxp_dxcn @ dxcn_dXcn @ dXcn_dx      # (2,3)
            r = xp_pred - xp
            w = safe.astype(x.dtype)
            return Jr * w, r * w

        J, r = jax.vmap(per_group)(groups_R, groups_T, obs_xp, obs_mask)
        invC = 1.0 / opts.Rtri
        H = invC * jnp.einsum("gij,gik->jk", J, J)
        b = invC * jnp.einsum("gij,gi->j", J, r)
        res_norm = jnp.sum(jnp.linalg.norm(r, axis=1))
        return H, b, res_norm

    def body(_, carry):
        x, x_best, res_best, H_best, done = carry
        H, b, res = residuals(x)
        # revert-on-worse (src/feature.cpp:362-367)
        worse = res > res_best
        delta = jnp.linalg.lstsq(
            H + opts.damping * jnp.eye(3, dtype=x.dtype), b)[0]
        x_new = x - delta
        small = jnp.max(jnp.abs(delta)) < opts.eps
        stop = done | worse | small
        x_best = jnp.where(worse | done, x_best, x)
        res_best = jnp.where(worse | done, res_best, res)
        H_best = jnp.where(worse | done, H_best, H)
        x = jnp.where(stop, x_best, x_new)
        return x, x_best, res_best, H_best, stop

    H0 = jnp.eye(3, dtype=x0.dtype)
    init = (x0, x0, jnp.asarray(jnp.inf, x0.dtype), H0,
            jnp.asarray(False))
    x, x_best, res_best, H_best, _ = jax.lax.fori_loop(
        0, opts.max_iters + 1, body, init)

    ok = (res_best <= opts.max_res_norm * jnp.maximum(n_obs, 1.0)) \
        & (n_obs >= 1)
    # reference gate compares the SUM of residual norms (not per-obs);
    # we scale by n_obs since capacity NG >> typical track length makes
    # the raw sum depend on window occupancy
    if opts.use_hessian:
        Hp = jnp.linalg.pinv(H_best)
        good = jnp.isfinite(Hp).all()
        Psub = jnp.where(good, Hp, Psub0)
    else:
        Psub = Psub0
    x_out = jnp.where(ok, x_best, x0)
    return x_out, Psub, ok
