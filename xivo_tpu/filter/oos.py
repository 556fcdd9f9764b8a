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
        dxp_dXcn = dxp_dxcn @ dxcn_dXcn

        dXcn_dXb = Rbc_t
        Hf = dxp_dXcn @ dXcn_dXb @ Rg.T                       # w.r.t. Xs
        HW = dxp_dXcn @ dXcn_dXb @ so3.hat(Xb)                # group W
        HT = dxp_dXcn @ dXcn_dXb @ (-Rg.T)                    # group T
        HWbc = dxp_dXcn @ so3.hat(Xcn_s)
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

    def one(slotrow):
        ok = slotrow >= 0
        Ho, inn_o, valid = _oos_rows_for_feature(cfg, s, slotrow)
        return Ho * ok, inn_o * ok, valid & ok

    Ho, inn_o, valid = jax.vmap(one)(row_of_slot)
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
