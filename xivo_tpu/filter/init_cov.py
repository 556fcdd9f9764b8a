"""Correlated feature-initialization covariance. EXPERIMENTAL.

STATUS: default-off (`approximate_init_covariance=False`) and known
unstable in the full pipeline — the joint-PSD construction holds in
isolation but the e2e interaction with gauge freezing / slot churn
still produces indefinite covariances. Round-2 work item
(ARCHITECTURE.md roadmap #1); kept as the starting point.

Derivation notes:

Port of the reference's APPROXIMATE_INIT_COVARIANCE capability
(src/feature.cpp RefineDepth use_hessian block + FillCovarianceBlock
cross terms): a feature's local estimate x was obtained by filtering its
observations THROUGH the current pose/extrinsics estimates, so its error
is correlated with theirs. Ignoring that (the default, and the
reference's default) makes the joint state overconfident and lets
extrinsics absorb map error.

First-order model over the feature's observation history (the surviving
instate-group observations in the adjacency):

    0 ~= Hx dx + Hc d(Wbc,Tbc) + Hr_g dg + noise     per observation
    dx ~= -A sum(Hx^T W [Hc dc + Hr dg]) + A Hx^T W v,
    A = (sum Hx^T W Hx + eps I)^-1

giving cross-covariances  cov(x, c) = -A M_c P_cc,
cov(x, g) = -A M_g P_gg  and the inflation
P_xx += A (M_c P_cc M_c^T + sum M_g P_gg M_g^T) A^T.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from . import layout as L
from .config import VIOConfig
from .features import project_persp, unproject_logz
from .state import VIOState


def _obs_blocks(cfg: VIOConfig, s: VIOState, row):
    """Per-instate-group-slot measurement blocks for one feature row.

    Returns (N (3,3), Mc (3,6), Mg (G,3,6)) accumulated with W = 1/Rtri.
    """
    d = cfg.dims
    G = d.n_groups
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]

    rowc = jnp.maximum(row, 0)
    x = fr.x[rowc]
    gref = jnp.clip(fr.ref[rowc], 0, NG - 1)
    Xc, dXc_dx = unproject_logz(x)
    Rsc_ref = gr.Rsb[gref] @ s.X.Rbc
    Xs = Rsc_ref @ Xc + gr.Rsb[gref] @ s.X.Tbc + gr.Tsb[gref]
    dXs_dx = Rsc_ref @ dXc_dx
    Rbc_t = s.X.Rbc.T
    W = 1.0 / cfg.subfilter.Rtri

    def per_slot(j):
        grow = s.g2row[j]
        ok = grow >= 0
        growc = jnp.maximum(grow, 0)
        seen = fr.adj[rowc, growc] & ok & (growc != gref)
        Rg = gr.Rsb[growc]
        Tg = gr.Tsb[growc]
        Xb = Rg.T @ (Xs - Tg)
        Xcn = Rbc_t @ (Xb - s.X.Tbc)
        good = seen & (Xcn[2] > 1e-6)
        Xcn_s = jnp.where(good, Xcn, jnp.array([0.0, 0.0, 1.0], dtype))
        xcn, dxcn_dXcn = project_persp(Xcn_s)
        _, dxp_dxcn, _ = cam_mod.project_with_jac(kind, s.cam, xcn)
        dxp_dXcn = dxp_dxcn @ dxcn_dXcn
        Hx = dxp_dXcn @ Rbc_t @ Rg.T @ dXs_dx                # (2,3)
        HW = dxp_dXcn @ Rbc_t @ so3.hat(Xb)
        HT = dxp_dXcn @ Rbc_t @ (-Rg.T)
        HWbc = dxp_dXcn @ so3.hat(Xcn_s)
        HTbc = dxp_dXcn @ (-Rbc_t)
        w = good.astype(dtype)
        Hr = jnp.concatenate([HW, HT], axis=1) * w            # (2,6)
        Hc = jnp.concatenate([HWbc, HTbc], axis=1) * w
        Hx = Hx * w
        return Hx, Hc, Hr

    Hx, Hc, Hr = jax.vmap(per_slot)(jnp.arange(G))
    N = W * jnp.einsum("gri,grj->ij", Hx, Hx)                 # (3,3)
    Mc = W * jnp.einsum("gri,grj->ij", Hx, Hc)                # (3,6)
    Mg = W * jnp.einsum("gri,grj->gij", Hx, Hr)               # (G,3,6)
    return N, Mc, Mg


def add_init_correlations(cfg: VIOConfig, s: VIOState, new_slot_mask,
                          row_of_slot) -> VIOState:
    """Write cross-covariance blocks for newly admitted feature slots."""
    d = cfg.dims
    F = d.n_features
    G = d.n_groups
    D = d.full
    dtype = s.P.dtype
    fb = d.feature_begin

    # joint "other" block: extrinsics (6) + all group slots (6G) — using
    # the FULL covariance of these states (including their mutual
    # correlations) keeps the augmented matrix PSD per feature
    import numpy as _np
    oidx = _np.concatenate([
        _np.arange(L.WBC, L.WBC + 6),
        _np.arange(L.GROUP_BEGIN, L.GROUP_BEGIN + 6 * G)])
    P_oo = s.P[jnp.asarray(oidx)][:, jnp.asarray(oidx)]   # (6+6G, 6+6G)

    def per_slot(slot):
        row = row_of_slot[slot]
        use = new_slot_mask[slot] & (row >= 0)
        N, Mc, Mg = _obs_blocks(cfg, s, row)
        # only meaningful when the observation set actually determines x:
        # a near-singular N would inject garbage — skip those features
        wellposed = jnp.linalg.eigvalsh(N)[0] > 1e-2
        use = use & wellposed
        A = jnp.linalg.inv(N + 1e-3 * jnp.eye(3, dtype=dtype))
        M = jnp.concatenate(
            [Mc, Mg.transpose(1, 0, 2).reshape(3, 6 * G)], axis=1)
        AM = A @ M                                            # (3, 6+6G)
        C = -(AM @ P_oo)                                      # (3, 6+6G)
        infl = AM @ P_oo @ AM.T                               # (3,3)
        u = use.astype(dtype)
        return C * u, infl * u

    C, infl = jax.vmap(per_slot)(jnp.arange(F))
    # assemble the (3F, D) cross-row block
    rows = jnp.zeros((3 * F, D), dtype)
    rows = rows.at[:, jnp.asarray(oidx)].set(C.reshape(3 * F, 6 + 6 * G))

    P = s.P.at[fb:, :].add(rows)
    P = P.at[:, fb:].add(rows.T)
    # (rows has no columns in the feature region, so no double count)
    eye = jnp.eye(F, dtype=dtype)
    BD = jnp.einsum("fij,fg->figj", infl, eye).reshape(3 * F, 3 * F)
    P = P.at[fb:, fb:].add(BD)
    P = 0.5 * (P + P.T)
    return s._replace(P=P)
