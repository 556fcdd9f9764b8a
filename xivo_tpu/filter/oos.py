"""Out-of-state (MSCKF-style) measurement update.

The reference carries the full machinery (src/oos.cpp: per-observation
Hx/Hf blocks, left-nullspace projection of the landmark Jacobian via
Givens/SlowGivens) but hard-faults when enabled
(src/estimator.cpp:120-122). Here it is first-class, as the north star
requires: features dropped by the tracker WITHOUT ever entering the
state still contribute their multi-view geometry — the classic MSCKF
update at marginalization time.

TPU shape: each candidate feature produces a fixed (2G, D) Jacobian
over the instate group slots (masked rows for slots that did not
observe it), the landmark direction is eliminated with THREE
closed-form Householder reflectors (straight-line code — the algebra
of the reference's Givens sweeps, src/helpers.cpp:48-75, without
XLA's catastrophic per-panel QR lowering on TPU), and all surviving
rows join a single Joseph update with R = oos_meas_std^2. Stacked-row
measurement compression is likewise QR-free: a Gram + masked-Cholesky
square root of the information (exactly equivalent for iid R).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from ..ops.dense import HIGHEST
from . import layout as L
from .config import VIOConfig
from .features import project_persp, unproject_logz
from .state import VIOState


def _householder_nullspace(Hf, Hx, inn):
    """Left-nullspace projection of the (m, 3) landmark Jacobian by a
    fixed sweep of THREE closed-form Householder reflectors.

    Replaces ``jnp.linalg.qr(Hf, mode="complete")`` — whose XLA TPU
    lowering runs a serialized panel loop (~26 ms/frame-batch at these
    shapes, ARCHITECTURE.md) — with straight-line VPU code: apply the
    reflectors that triangularize Hf to [Hx | inn] and keep rows 3:,
    i.e. the last m-3 rows of Q^T [Hx | inn]. Equal to A^T [Hx | inn]
    (A = Q[:, 3:]) up to a left orthogonal transform, which preserves
    the EKF update exactly under iid measurement noise. Masked (zero)
    rows of Hf pass through untouched and stay zero. Parity anchor:
    the reference's Givens elimination (src/helpers.cpp:48-75) used by
    SlowGivens in src/oos.cpp:8-89.

    Returns (Ho (m-3, D), inn_o (m-3,)).
    """
    m = Hf.shape[0]
    dtype = Hf.dtype
    ridx = jnp.arange(m)
    M = jnp.concatenate([Hx, inn[:, None]], axis=1)
    A = Hf
    for k in range(3):
        x = jnp.where(ridx >= k, A[:, k], jnp.zeros((), dtype))
        nx = jnp.sqrt(jnp.sum(x * x))
        sign = jnp.where(x[k] >= 0, 1.0, -1.0).astype(dtype)
        v = x + (sign * nx) * (ridx == k).astype(dtype)
        vn2 = jnp.sum(v * v)
        ok = vn2 > 1e-24
        beta = jnp.where(ok, 2.0 / jnp.where(ok, vn2, 1.0),
                         jnp.zeros((), dtype))
        A = A - beta * jnp.outer(v, v @ A)
        M = M - beta * jnp.outer(v, v @ M)
    return M[3:, :-1], M[3:, -1]


def _oos_rows_for_feature(cfg: VIOConfig, s: VIOState, row):
    """Build nullspace-projected OOS rows for one feature table row.

    Returns (Ho (2G, D), inn (2G,), row_valid (2G,)) — after projection
    at most 2m-3 rows are nonzero for m observations.
    """
    d = cfg.dims
    G = d.n_groups
    D = d.full
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]

    rowc = jnp.maximum(row, 0)
    x = fr.x[rowc]
    gref = jnp.clip(fr.ref[rowc], 0, NG - 1)
    # landmark position from the subfilter estimate (cf. oos.cpp:17)
    Xc, _ = unproject_logz(x)
    Rsc_ref = gr.Rsb[gref] @ s.X.Rbc
    Xs = Rsc_ref @ Xc + gr.Rsb[gref] @ s.X.Tbc + gr.Tsb[gref]
    fej = cfg.use_fej and cfg.oos_fej
    if fej:
        # FEJ-consistent linearization point of the landmark: anchored
        # through the ref group's FIRST pose estimate, matching the
        # instate update's treatment of the cloned-pose blocks — the
        # standard MSCKF-FEJ discipline (the residual below keeps the
        # current estimates)
        Xs_l = (gr.Rsb_fej[gref] @ s.X.Rbc @ Xc
                + gr.Rsb_fej[gref] @ s.X.Tbc + gr.Tsb_fej[gref])
    else:
        Xs_l = Xs

    Rbc_t = s.X.Rbc.T

    def per_slot(j):
        grow = s.g2row[j]
        ok = grow >= 0
        growc = jnp.maximum(grow, 0)
        seen = fr.adj[rowc, growc] & ok
        Rg = gr.Rsb[growc]
        Tg = gr.Tsb[growc]
        xp_obs = fr.adj_xp[rowc, growc]

        Xb = Rg.T @ (Xs - Tg)
        Xcn = Rbc_t @ (Xb - s.X.Tbc)
        good = seen & (Xcn[2] > 1e-6)
        Xcn_s = jnp.where(good, Xcn, jnp.array([0.0, 0.0, 1.0], dtype))
        xcn, dxcn_dXcn = project_persp(Xcn_s)
        xp_pred, dxp_dxcn, _ = cam_mod.project_with_jac(kind, s.cam, xcn)

        if fej:
            # jacobian chain at the group's first pose estimate
            Rg_l, Tg_l = gr.Rsb_fej[growc], gr.Tsb_fej[growc]
            Xb_l = Rg_l.T @ (Xs_l - Tg_l)
            Xcn_l = Rbc_t @ (Xb_l - s.X.Tbc)
            good = good & (Xcn_l[2] > 1e-6)
            Xcn_l = jnp.where(good, Xcn_l,
                              jnp.array([0.0, 0.0, 1.0], dtype))
            xcn_l, dxcn_dXcn_l = project_persp(Xcn_l)
            _, dxp_dxcn_l, _ = cam_mod.project_with_jac(
                kind, s.cam, xcn_l)
            dxp_dXcn = dxp_dxcn_l @ dxcn_dXcn_l
        else:
            Rg_l, Tg_l, Xb_l, Xcn_l = Rg, Tg, Xb, Xcn_s
            dxp_dXcn = dxp_dxcn @ dxcn_dXcn

        dXcn_dXb = Rbc_t
        Hf = dxp_dXcn @ dXcn_dXb @ Rg_l.T                     # w.r.t. Xs
        HW = dxp_dXcn @ dXcn_dXb @ so3.hat(Xb_l)              # group W
        HT = dxp_dXcn @ dXcn_dXb @ (-Rg_l.T)                  # group T
        HWbc = dxp_dXcn @ so3.hat(Xcn_l)
        HTbc = dxp_dXcn @ (-Rbc_t)

        Hx = jnp.zeros((2, D), dtype)
        goff = L.GROUP_BEGIN + 6 * j                          # static!
        Hx = Hx.at[:, goff:goff + 3].set(HW)
        Hx = Hx.at[:, goff + 3:goff + 6].set(HT)
        Hx = Hx.at[:, L.WBC:L.WBC + 3].set(HWbc)
        Hx = Hx.at[:, L.TBC:L.TBC + 3].set(HTbc)
        inn = xp_obs - xp_pred
        w = good.astype(dtype)
        return Hx * w, Hf * w, inn * w, good

    Hx, Hf, inn, good = [], [], [], []
    for j in range(G):   # static unroll over group slots
        a, b, c, g = per_slot(j)
        Hx.append(a)
        Hf.append(b)
        inn.append(c)
        good.append(g)
    Hx = jnp.concatenate(Hx)            # (2G, D)
    Hf = jnp.concatenate(Hf)            # (2G, 3)
    inn = jnp.concatenate(inn)          # (2G,)
    nobs = jnp.sum(jnp.stack(good).astype(jnp.int32))

    # left-nullspace projection of Hf via 3 Householder reflectors
    Ho, inn_o = _householder_nullspace(Hf, Hx, inn)
    # valid rows: nonzero projected Jacobian + enough observations
    enough = nobs >= cfg.OOS_min_observations
    rownorm = jnp.linalg.norm(Ho, axis=1)
    valid = (rownorm > 1e-10) & enough
    Ho = jnp.where(valid[:, None], Ho, 0.0)
    inn_o = jnp.where(valid, inn_o, 0.0)
    # pad back to 2G rows for a static stack
    pad = jnp.zeros((3, Ho.shape[1]), dtype)
    return (jnp.concatenate([Ho, pad]),
            jnp.concatenate([inn_o, jnp.zeros((3,), dtype)]),
            jnp.concatenate([valid, jnp.zeros((3,), bool)]))


def _oos_rows_all(cfg: VIOConfig, s: VIOState, rows):
    """Vectorized OOS row builder for ALL CAP candidate rows at once.

    Same math as ``_oos_rows_for_feature`` (pinned equal in
    tests/test_oos.py) expressed as fused (CAP, G) einsums instead of a
    per-feature vmap over a G-unrolled per-slot loop — the loop emitted
    ~10 tiny matmuls per (feature, slot) pair, the dominant OOS stack-
    build cost on device (round-5). Returns (Ho (CAP, 2G, D),
    inn (CAP, 2G), valid (CAP, 2G)).
    """
    from ..ops.dense import oh_take
    d = cfg.dims
    G = d.n_groups
    D = d.full
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr, gr = s.features, s.groups
    NF = fr.fid.shape[0]
    NG = gr.gid.shape[0]
    CAP = rows.shape[0]

    rowc = jnp.maximum(rows, 0)
    x = oh_take(fr.x, rowc, NF)                            # (CAP,3)
    gref = jnp.clip(oh_take(fr.ref, rowc, NF), 0, NG - 1)
    Rr = oh_take(gr.Rsb, gref, NG)                         # (CAP,3,3)
    Tr = oh_take(gr.Tsb, gref, NG)
    Rbc, Tbc = s.X.Rbc, s.X.Tbc
    Rbc_t = Rbc.T
    Xc = jax.vmap(lambda v: unproject_logz(v)[0])(x)       # (CAP,3)
    Xs = jnp.einsum("fij,fj->fi", Rr, Xc @ Rbc.T + Tbc) + Tr
    fej = cfg.use_fej and cfg.oos_fej
    if fej:
        Rr_l = oh_take(gr.Rsb_fej, gref, NG)
        Tr_l = oh_take(gr.Tsb_fej, gref, NG)
        Xs_l = jnp.einsum("fij,fj->fi", Rr_l, Xc @ Rbc.T + Tbc) + Tr_l
    else:
        Xs_l = Xs

    grow = s.g2row                                         # (G,)
    ok_g = grow >= 0
    growc = jnp.maximum(grow, 0)
    Rg = oh_take(gr.Rsb, growc, NG)                        # (G,3,3)
    Tg = oh_take(gr.Tsb, growc, NG)
    # seen/xp via one-hot down both table axes (no traced gathers)
    adjrow = oh_take(fr.adj, rowc, NF)                     # (CAP,NG)
    xprow = oh_take(fr.adj_xp, rowc, NF)                   # (CAP,NG,2)
    ohg = (growc[:, None] == jnp.arange(NG)[None, :]
           ).astype(dtype)                                 # (G,NG)
    seen = (jnp.einsum("fn,gn->fg", adjrow.astype(dtype), ohg)
            > 0.5) & ok_g[None, :]                         # (CAP,G)
    xp_obs = jnp.einsum("fnk,gn->fgk", xprow, ohg)         # (CAP,G,2)

    # current-estimate geometry -> prediction + residual
    Xb = jnp.einsum("gji,fgj->fgi", Rg,
                    Xs[:, None, :] - Tg[None, :, :])       # (CAP,G,3)
    Xcn = jnp.einsum("ji,fgj->fgi", Rbc, Xb - Tbc[None, None, :])
    good = seen & (Xcn[..., 2] > 1e-6)
    Xcn_s = jnp.where(good[..., None], Xcn,
                      jnp.asarray([0.0, 0.0, 1.0], dtype))
    flat = Xcn_s.reshape(CAP * G, 3)
    xcn, dxcn_dXcn = jax.vmap(project_persp)(flat)
    xp_pred, dxp_dxcn, _ = jax.vmap(
        lambda v: cam_mod.project_with_jac(kind, s.cam, v))(xcn)
    inn = xp_obs - xp_pred.reshape(CAP, G, 2)

    if fej:
        # jacobian chain at the groups' first pose estimates
        Rg_l = oh_take(gr.Rsb_fej, growc, NG)
        Tg_l = oh_take(gr.Tsb_fej, growc, NG)
        Xb_l = jnp.einsum("gji,fgj->fgi", Rg_l,
                          Xs_l[:, None, :] - Tg_l[None, :, :])
        Xcn_l = jnp.einsum("ji,fgj->fgi", Rbc,
                           Xb_l - Tbc[None, None, :])
        good = good & (Xcn_l[..., 2] > 1e-6)
        Xcn_l = jnp.where(good[..., None], Xcn_l,
                          jnp.asarray([0.0, 0.0, 1.0], dtype))
        flat_l = Xcn_l.reshape(CAP * G, 3)
        xcn_l, dxcn_l = jax.vmap(project_persp)(flat_l)
        _, dxp_l, _ = jax.vmap(
            lambda v: cam_mod.project_with_jac(kind, s.cam, v))(xcn_l)
        P2 = jnp.einsum("nij,njk->nik", dxp_l,
                        dxcn_l).reshape(CAP, G, 2, 3)
    else:
        Rg_l, Xb_l, Xcn_l = Rg, Xb, Xcn_s
        P2 = jnp.einsum("nij,njk->nik", dxp_dxcn,
                        dxcn_dXcn).reshape(CAP, G, 2, 3)

    Bc = jnp.einsum("ij,gkj->gik", Rbc_t, Rg_l)            # Rbc^T Rg^T
    Hf = jnp.einsum("fgij,gjk->fgik", P2, Bc)              # (CAP,G,2,3)
    hatXb = jax.vmap(jax.vmap(so3.hat))(Xb_l)
    HW = jnp.einsum("fgij,jk,fgkl->fgil", P2, Rbc_t, hatXb)
    HT = -Hf
    HWbc = jnp.einsum("fgij,fgjk->fgik", P2,
                      jax.vmap(jax.vmap(so3.hat))(Xcn_l))
    HTbc = jnp.einsum("fgij,jk->fgik", P2, -Rbc_t)

    w = good.astype(dtype)[..., None, None]
    Hf = Hf * w
    inn = inn * good.astype(dtype)[..., None]
    # dense (CAP, G, 2, D) rows from static column segments: the group
    # pair lands at slot-column block g (eye placement), Wbc/Tbc at
    # their static offsets, everything else zero
    Hgrp = jnp.einsum("gh,fgrk->fgrhk", jnp.eye(G, dtype=dtype),
                      jnp.concatenate([HW, HT], axis=-1) * w
                      ).reshape(CAP, G, 2, 6 * G)
    z = lambda n: jnp.zeros((CAP, G, 2, n), dtype)
    Hx = jnp.concatenate([
        z(L.WBC), HWbc * w, HTbc * w,
        z(L.GROUP_BEGIN - (L.WBC + 6)), Hgrp,
        z(D - L.GROUP_BEGIN - 6 * G)], axis=-1)            # (CAP,G,2,D)

    Hx = Hx.reshape(CAP, 2 * G, D)
    Hf = Hf.reshape(CAP, 2 * G, 3)
    inn = inn.reshape(CAP, 2 * G)
    nobs = jnp.sum(good.astype(jnp.int32), axis=1)         # (CAP,)

    Ho, inn_o = jax.vmap(_householder_nullspace)(Hf, Hx, inn)
    enough = nobs >= cfg.OOS_min_observations
    rownorm = jnp.linalg.norm(Ho, axis=-1)
    valid = (rownorm > 1e-10) & enough[:, None]
    Ho = jnp.where(valid[..., None], Ho, 0.0)
    inn_o = jnp.where(valid, inn_o, 0.0)
    pad = jnp.zeros((CAP, 3, D), dtype)
    return (jnp.concatenate([Ho, pad], axis=1),
            jnp.concatenate([inn_o, jnp.zeros((CAP, 3), dtype)], axis=1),
            jnp.concatenate([valid, jnp.zeros((CAP, 3), bool)], axis=1))


def oos_update(cfg: VIOConfig, s: VIOState, candidate_rows):
    """Joint MSCKF update over the frame's dying features.

    The per-frame feature budget is cfg.oos_feature_cap (static shape);
    candidates rank by instate-observation count so the MOST-informed
    features always make the update. Returns (state, n_dropped) where
    n_dropped counts candidates beyond the cap this frame (surfaced in
    StepOutputs.num_oos_dropped — no silent truncation).
    """
    from .pipeline import _rank_assign  # shared slot-assignment helper

    CAP = cfg.oos_feature_cap
    d = cfg.dims
    fr, gr = s.features, s.groups
    NF = fr.fid.shape[0]
    NG = gr.gid.shape[0]

    obs_in_state = fr.adj & gr.instate[None, :]
    nobs = jnp.sum(obs_in_state, axis=1)
    cand = candidate_rows & (nobs >= cfg.OOS_min_observations)
    n_dropped = jnp.maximum(
        jnp.sum(cand.astype(jnp.int32)) - CAP, 0)

    slot_of_row, got = _rank_assign(
        jnp.ones((CAP,), bool), cand,
        -nobs.astype(s.P.dtype))
    # row chosen for each OOS slot (one-hot, no traced-index scatter)
    tgt = jnp.where(got, slot_of_row, CAP)
    oh = tgt[:, None] == jnp.arange(CAP, dtype=jnp.int32)[None, :]
    hit = jnp.any(oh, axis=0)
    ridx = jnp.sum(oh * jnp.arange(NF, dtype=jnp.int32)[:, None], axis=0,
                   dtype=jnp.int32)
    row_of_slot = jnp.where(hit, ridx, -1)

    ok = (row_of_slot >= 0)
    Ho, inn_o, valid = _oos_rows_all(cfg, s, row_of_slot)
    okf = ok.astype(s.P.dtype)[:, None]
    Ho = Ho * okf[..., None]
    inn_o = inn_o * okf
    valid = valid & ok[:, None]
    R2G = Ho.shape[1]
    Ho = Ho.reshape(CAP * R2G, d.full)
    inn_o = inn_o.reshape(-1)
    valid = valid.reshape(-1)

    Roos = cfg.oos_meas_std ** 2
    diagR = jnp.full(Ho.shape[0], Roos, s.P.dtype)
    # joseph_update expects per-2-row validity; OOS rows are single
    rv = valid
    dtype = s.P.dtype
    Hm = Ho * rv[:, None].astype(dtype)
    innm = inn_o * rv.astype(dtype)
    diagRm = jnp.where(rv, diagR, 1.0)

    if cfg.use_oc_meas:
        # same observability projection as the instate update: group
        # blocks here are linearized at CURRENT estimates, which drift
        # between updates; forcing H N(fej) = 0 keeps the multi-view
        # rows from leaking global translation/yaw information
        from .update import oc_nullspace, oc_project_rows
        Hm = oc_project_rows(Hm, oc_nullspace(cfg, s))

    if cfg.use_compression and Hm.shape[0] > int(
            cfg.compression_trigger_ratio * d.full):
        # Measurement compression (use_compression, the reference's
        # present-but-unused QR at src/helpers.cpp:77-101): with iid
        # noise the EKF update depends on H only through H^T H and
        # H^T inn, so ANY (Hc, innc) with Hc^T Hc = H^T H and
        # Hc^T innc = H^T inn is exactly equivalent. One masked
        # Cholesky of the bordered Gram [[H^T H, H^T inn], [., |inn|^2]]
        # = [[L, 0], [w^T, .]] yields Hc = L^T AND innc = w = L^-1
        # H^T inn together — no QR, no triangular solve (both
        # catastrophic XLA TPU lowerings, ARCHITECTURE.md). Rows shrink
        # from the stack size to D.
        # batch-in-LANES kernel (ops/lanes_chol.py) — the same kernel
        # class the per-frame D x D recompression rides; the sublane
        # kernel (ops/chol_pallas.py) pays grid x m sequential depth at
        # m = D+1 = 229 (round-5 consistency-stage profile)
        from ..ops.lanes_chol import chol_psd_lanes
        Mb = jnp.concatenate([Hm, innm[:, None]], axis=1)  # (rows, D+1)
        Gb = jnp.matmul(Mb.T, Mb, precision=HIGHEST)       # (D+1, D+1)
        rel = 1e-12 if dtype == jnp.float64 else 1e-6
        Gb = Gb + (rel * jnp.diagonal(Gb)) * jnp.eye(d.full + 1,
                                                     dtype=dtype)
        Lb = chol_psd_lanes(Gb)
        Hm = Lb[:d.full, :d.full].T                        # (D, D) upper
        innm = Lb[d.full, :d.full]                         # L^-1 H^T inn
        rv = jnp.linalg.norm(Hm, axis=1) > 1e-10
        diagRm = jnp.where(rv, Roos, 1.0)
        Hm = Hm * rv[:, None].astype(dtype)
        innm = innm * rv.astype(dtype)

    if cfg.covariance_form == "sqrt":
        # factor downdate, per-row validity (rows here are single, not
        # 2-row feature pairs — sqrt_update masks each row on its own)
        from .sqrt_form import sqrt_update
        err, P = sqrt_update(s.P, Hm, innm, diagRm, rv)
    else:
        HP = Hm @ s.P
        S = HP @ Hm.T + jnp.diag(diagRm)
        c, lower = jax.scipy.linalg.cho_factor(S, lower=True)
        Kt = jax.scipy.linalg.cho_solve((c, lower), HP)
        K = Kt.T
        err = K @ innm
        IKH = K @ Hm - jnp.eye(d.full, dtype=dtype)
        P = IKH @ s.P @ IKH.T + (K * diagRm[None, :]) @ K.T
        P = 0.5 * (P + P.T)

    do = jnp.any(rv)
    from .update import absorb_error
    err = jnp.where(do, err, 0.0)
    P = jnp.where(do, P, s.P)
    s = s._replace(P=P)
    return absorb_error(cfg, s, err), n_dropped
