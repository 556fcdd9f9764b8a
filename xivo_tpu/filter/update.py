"""EKF measurement update: stacked Jacobians, MH gating, Joseph form.

TPU design: the per-feature 2-row Jacobian blocks are computed by one
``vmap`` over the feature *slots* (fixed count F), scattered into a dense
H of static shape (2F, D); invalid slots contribute zero rows with unit
dummy R, which the Joseph form provably ignores (their Kalman-gain
columns vanish). The update is then three dense matmuls + one Cholesky
solve — exactly the shape of work the MXU wants, with no dynamic shapes
anywhere. Parity targets: src/update.cpp, src/estimator.cpp:1257-1288.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from ..ops.dense import oh_take
from . import layout as L
from .config import VIOConfig
from .features import compute_jacobian
from .retraction import apply_camera_error
from .state import FS_GAUGE, FS_INSTATE, VIOState


class StackedJac(NamedTuple):
    H: jnp.ndarray        # (2F, D)
    inn: jnp.ndarray      # (2F,)
    valid: jnp.ndarray    # (F,) slot validity
    pred: jnp.ndarray     # (F, 2) predicted pixels per slot


def oc_nullspace(cfg: VIOConfig, s: VIOState) -> jnp.ndarray:
    """(D, 4) basis of the global-transform unobservable subspace at the
    FIRST-ESTIMATE linearization points: columns 0-2 global translation,
    column 3 global yaw about gravity.

    Right-multiplicative body-frame error convention (same as
    propagate.oc_correct_phi): under (R_y = Exp(phi g x), t) the error
    directions are dWsb = Rsb^T g, dTsb = t + phi (g x Tsb),
    dVsb = phi (g x Vsb); group clones likewise at their FEJ poses.
    Feature rows are ZERO: the local (X/Z, Y/Z, log Z)-in-ref-cam
    parameterization is invariant under global transforms — one of the
    payoffs of the group-anchored design (ARCHITECTURE.md). Extrinsics,
    biases, intrinsics and td are invariant; the 2-dim Wsg block drops
    the (unobservable) z-rotation entry, which is exactly the yaw
    direction, so its rows are zero too.
    """
    d = cfg.dims
    dtype = s.P.dtype
    g0 = jnp.asarray(cfg.gravity, dtype)
    gs = s.X.Rsg @ g0
    ghat = gs / (jnp.linalg.norm(gs) + 1e-20)
    hg = so3.hat(ghat)

    N = jnp.zeros((d.full, 4), dtype)
    N = N.at[L.TSB:L.TSB + 3, 0:3].set(jnp.eye(3, dtype=dtype))
    N = N.at[L.WSB:L.WSB + 3, 3].set(s.X.Rsb.T @ ghat)
    N = N.at[L.TSB:L.TSB + 3, 3].set(hg @ s.X.Tsb)
    N = N.at[L.VSB:L.VSB + 3, 3].set(hg @ s.X.Vsb)

    G = d.n_groups
    NGR = s.groups.gid.shape[0]
    rows = jnp.maximum(s.g2row, 0)
    ok = (s.g2row >= 0).astype(dtype)
    Rf = oh_take(s.groups.Rsb_fej, rows, NGR)        # (G, 3, 3)
    Tf = oh_take(s.groups.Tsb_fej, rows, NGR)        # (G, 3)
    Ng = jnp.zeros((G, 6, 4), dtype)
    Ng = Ng.at[:, 0:3, 3].set(jnp.einsum("gij,i->gj", Rf, ghat)
                              * ok[:, None])
    Ng = Ng.at[:, 3:6, 3].set(Tf @ hg.T * ok[:, None])
    Ng = Ng.at[:, 3:6, 0:3].set(jnp.eye(3, dtype=dtype)[None]
                                * ok[:, None, None])
    return N.at[L.GROUP_BEGIN:L.GROUP_BEGIN + 6 * G, :].set(
        Ng.reshape(6 * G, 4))


def oc_project_rows(H: jnp.ndarray, N: jnp.ndarray) -> jnp.ndarray:
    """Project measurement rows onto the observable subspace:
    H <- H - (H N)(N^T N)^-1 N^T, so H N = 0 EXACTLY and no spurious
    information enters along global translation/yaw (the
    measurement-side OC counterpart of oc_correct_phi; Hesch et al.
    TRO'13). With partially-applied FEJ (clone blocks at first
    estimates, motion block at the current prior) the raw rows have
    H N != 0 of linearization-drift size — measured NEES inflation
    ~10x on the tube-world study — and this projection removes it.
    Zero rows stay exactly zero (the operation is linear)."""
    HN = jnp.matmul(H, N, precision=jax.lax.Precision.HIGHEST)
    Gm = jnp.matmul(N.T, N, precision=jax.lax.Precision.HIGHEST)
    Gm = Gm + 1e-12 * jnp.trace(Gm) * jnp.eye(4, dtype=H.dtype)
    return H - HN @ jnp.linalg.solve(Gm, N.T)


def build_stacked_jacobian(cfg: VIOConfig, s: VIOState) -> StackedJac:
    """Compute Jacobian rows for every occupied feature slot.

    Vectorized version of Estimator::ComputeInstateJacobians
    (src/update.cpp:24-32) + FillJacobianBlock scatter
    (src/feature.cpp:658-684; the reference's double-write bug at :675-676
    is deliberately not reproduced — see SURVEY.md §7.3).
    """
    d = cfg.dims
    D = d.full
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    fr = s.features
    gr = s.groups

    # pre-gather every slot's inputs via one-hot matmuls (traced-index
    # gathers inside the vmap serialize on TPU; see ops.dense.oh_take)
    F = d.n_features
    NFR = fr.fid.shape[0]
    NGR = gr.gid.shape[0]
    row = s.f2row                                   # (F,)
    valid = row >= 0
    rowc = jnp.maximum(row, 0)
    x_s = oh_take(fr.x, rowc, NFR)
    xp_s = oh_take(fr.xp, rowc, NFR)
    gref = jnp.maximum(oh_take(fr.ref, rowc, NFR), 0)
    Rsbr_s = oh_take(gr.Rsb, gref, NGR)
    Tsbr_s = oh_take(gr.Tsb, gref, NGR)
    gslot = jnp.maximum(oh_take(gr.sind, gref, NGR), 0)

    def one_slot(ok, x, xp, Rsbr, Tsbr, Rf, Tf, xfe):
        jr = compute_jacobian(kind, s.cam, s.X, Rsbr, Tsbr, x, xp,
                              s.last_gyro, cfg.online_camera_calib)
        J_group, J_feat = jr.J_group, jr.J_feat
        if cfg.use_fej:
            # first-estimates Jacobians: the cloned-state blocks (group
            # pose, feature) are linearized at the states' first
            # estimates so unobservable directions gain no spurious
            # information; the residual keeps the current estimates
            # fej_feature_block=False evaluates the FEJ chain at the
            # CURRENT feature estimate (poses still first-estimate):
            # x is parameterized relative to the ref group, so the
            # global-direction cancellations hold at any x and the
            # stale-x linearization error is pure accuracy loss
            xl = xfe if cfg.fej_feature_block else x
            jf = compute_jacobian(kind, s.cam, s.X, Rf, Tf, xl, xp,
                                  s.last_gyro, cfg.online_camera_calib)
            J_group, J_feat = jf.J_group, jf.J_feat
        okf = ok.astype(dtype)
        return (jr.J_motion * okf, jr.J_cam * okf, J_group * okf,
                J_feat * okf, jr.inn * okf, jr.xp_pred)

    if cfg.use_fej:
        Rf_s = oh_take(gr.Rsb_fej, gref, NGR)
        Tf_s = oh_take(gr.Tsb_fej, gref, NGR)
        xfe_s = oh_take(fr.x_fej, rowc, NFR)
    else:
        Rf_s, Tf_s, xfe_s = Rsbr_s, Tsbr_s, x_s
    Jm, Jc, Jg, Jf, inn, pred = jax.vmap(one_slot)(
        valid, x_s, xp_s, Rsbr_s, Tsbr_s, Rf_s, Tf_s, xfe_s)

    # mask the temporal blocks if those calibrations are off (their P
    # rows are zero so they'd be inert anyway; masking keeps S cleaner).
    # NOTE: bg/Cg coupling through td vanishes with td fixed at 0
    # only when td==0; the reference omits these blocks entirely
    # without temporal calib (src/feature.cpp:593 #ifdef), so the
    # bg block must revert to zero too (bg still affects the
    # measurement only through propagation).
    colmask = [1.0] * L.MOTION
    if not cfg.online_temporal_calib:
        colmask[L.TD] = 0.0
        colmask[L.BG:L.BG + 3] = [0.0] * 3
    if not cfg.online_imu_calib:
        colmask[L.CG:L.CG + 9] = [0.0] * 9
    if any(c == 0.0 for c in colmask):
        Jm = Jm * jnp.asarray(colmask, dtype)

    # Scatter-free assembly: a vmapped dynamic_update_slice at per-slot
    # offsets lowers to a SERIALIZED scatter while-loop on TPU (measured
    # ~6 ms/frame-batch each); one-hot placement is dense MXU work.
    G = d.n_groups
    oh = jax.nn.one_hot(gslot, G, dtype=dtype)                  # (F, G)
    Hgrp = jnp.einsum("fg,frk->frgk", oh, Jg).reshape(F, 2, 6 * G)
    Hfeat = jnp.einsum("fg,frk->frgk", jnp.eye(F, dtype=dtype),
                       Jf).reshape(F, 2, 3 * F)
    H = jnp.concatenate([Jm, Jc, Hgrp, Hfeat], axis=2).reshape(2 * F, D)
    if cfg.use_oc_meas:
        H = oc_project_rows(H, oc_nullspace(cfg, s))
    return StackedJac(H=H,
                      inn=inn.reshape(2 * F),
                      valid=valid, pred=pred)


def mh_distances(P, H, inn, R):
    """Per-slot Mahalanobis distances using 2x2 innovation blocks.

    Mirrors MHGating's per-feature S = J P J^T + R I (src/update.cpp:59-70)
    — computed for ALL slots in one batched einsum + 2x2 closed-form solve.
    Accepts either a dense covariance (square) or a square-root factor
    (rectangular, P = S S^T — see filter/sqrt_form.py).
    """
    F = H.shape[0] // 2
    idx = jnp.arange(F)
    if P.shape[0] != P.shape[1]:
        from .sqrt_form import factor_innovation_blocks
        b00, b01, b11 = factor_innovation_blocks(P, H)
        S00, S01, S11 = b00 + R, b01, b11 + R
    else:
        HP = H @ P                       # (2F, D)
        S_full = HP @ H.T                # (2F, 2F)
        S00 = S_full[2 * idx, 2 * idx] + R
        S01 = S_full[2 * idx, 2 * idx + 1]
        S11 = S_full[2 * idx + 1, 2 * idx + 1] + R
    r0 = inn[2 * idx]
    r1 = inn[2 * idx + 1]
    det = S00 * S11 - S01 * S01
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    # r^T S^-1 r in closed form
    return (S11 * r0 * r0 - 2.0 * S01 * r0 * r1 + S00 * r1 * r1) / det


def mh_gate(cfg: VIOConfig, dist, valid):
    """Threshold relaxation loop of MHGating (src/update.cpp:72-96).

    Returns the inlier slot mask. Vectorized: counts inliers at every
    relaxed threshold and picks the first threshold admitting at least
    min_inliers (falling back to the loosest).
    """
    ks = jnp.arange(cfg.mh_relax_rounds)
    threshes = cfg.MH_thresh * cfg.MH_adjust_factor ** ks
    counts = jnp.sum((dist[None, :] < threshes[:, None]) & valid[None, :],
                     axis=1)
    good = counts >= cfg.min_inliers
    k = jnp.argmax(good)  # first satisfying round
    k = jnp.where(jnp.any(good), k, cfg.mh_relax_rounds - 1)
    thresh = cfg.MH_thresh * cfg.MH_adjust_factor ** k
    return valid & (dist < thresh)


def huber_robustify_R(inn, R, outlier_thresh, dtype):
    """Huber-style measurement-variance inflation on large innovations.

    Mirrors HuberOnInnovation (src/estimator.cpp:1290-1306): per 2-row
    feature block, ratio = |inn|^2 / (2 R) / outlier_thresh; blocks with
    ratio > 1 get R scaled by sqrt(ratio). (The reference defines this but
    never calls it — here it is a config-gated option, ``use_huber``.)
    Returns the per-row diag(R) vector, shape (2F,).
    """
    F = inn.shape[0] // 2
    blocks = inn.reshape(F, 2)
    ratio = jnp.sum(blocks * blocks, axis=1) / (2.0 * R) / outlier_thresh
    scale = jnp.where(ratio > 1.0, jnp.sqrt(ratio), 1.0)
    return jnp.repeat(R * scale, 2).astype(dtype)


def joseph_update(P, H, inn, diagR, row_valid):
    """Joseph-form EKF update with masked rows.

    Port of Estimator::UpdateJosephForm (src/estimator.cpp:1257-1288):
    S = H P H^T + R; K^T = S^-1 H P; err = K inn;
    P <- (KH - I) P (KH - I)^T + K R K^T.
    Invalid rows carry zero H/inn and R=1, making their K columns zero.
    """
    dtype = P.dtype
    m2 = H.shape[0]
    rv = jnp.repeat(row_valid, 2).astype(dtype)
    H = H * rv[:, None]
    inn = inn * rv
    diagR = jnp.where(rv > 0, diagR, 1.0)

    HP = H @ P
    S = HP @ H.T + jnp.diag(diagR)
    # solve via Cholesky (S symmetric PD by construction)
    c, lower = jax.scipy.linalg.cho_factor(S, lower=True)
    Kt = jax.scipy.linalg.cho_solve((c, lower), HP)   # (2F, D)
    K = Kt.T
    err = K @ inn
    IKH = K @ H
    IKH = IKH - jnp.eye(P.shape[0], dtype=dtype)
    P_new = IKH @ P @ IKH.T + (K * diagR[None, :]) @ K.T
    # enforce symmetry against fp drift
    P_new = 0.5 * (P_new + P_new.T)
    return err, P_new


def measurement_update(P, H, inn, diagR, feat_valid):
    """Form-dispatching EKF update: Joseph on a dense covariance, factor
    downdate on a square-root factor (filter/sqrt_form.py). feat_valid is
    per 2-row feature block; returns (err, P_new) in the same form."""
    if P.shape[0] != P.shape[1]:
        from .sqrt_form import sqrt_update
        return sqrt_update(P, H, inn, diagR,
                           jnp.repeat(feat_valid, 2))
    return joseph_update(P, H, inn, diagR, feat_valid)


def absorb_error(cfg: VIOConfig, s: VIOState, err) -> VIOState:
    """Inject the error estimate into every nominal state.

    Port of Estimator::AbsorbError (src/estimator.cpp:875-921).
    """
    d = cfg.dims
    cam = apply_camera_error(s.cam, err[L.CAM:L.CAM + L.NCAM]) \
        if cfg.online_camera_calib else s.cam

    gr = s.groups
    # group poses: route err segments to rows DENSELY via a one-hot
    # (row -> slot) matmul and apply the retraction to every row at once
    # (a fori_loop of per-slot scatters serializes on TPU)
    gerr = err[L.GROUP_BEGIN:L.GROUP_BEGIN + 6 * d.n_groups].reshape(
        d.n_groups, 6)
    instate_g = gr.sind >= 0
    oh_g = ((jnp.clip(gr.sind, 0, d.n_groups - 1)[:, None]
             == jnp.arange(d.n_groups)[None, :])
            & instate_g[:, None]).astype(err.dtype)       # (NG, G)
    gerr_row = oh_g @ gerr                                 # (NG, 6)

    # ALL rotation retractions (motion Wsb/Wbc/Wsg + every group row) as
    # ONE stacked exp/compose/project chain — the per-rotation chains
    # each cost a handful of tiny non-fusable dots, which dominate this
    # function's runtime at small state sizes (same math as
    # apply_motion_error / apply_group_error; src/core.h:135-165).
    wsg = jnp.concatenate([err[L.WSG:L.WSG + 2],
                           jnp.zeros((1,), err.dtype)])
    W_all = jnp.concatenate([
        err[L.WSB:L.WSB + 3][None], err[L.WBC:L.WBC + 3][None],
        wsg[None], gerr_row[:, :3]], axis=0)               # (3+NG, 3)
    R_all = jnp.concatenate([
        s.X.Rsb[None], s.X.Rbc[None], s.X.Rsg[None], gr.Rsb], axis=0)
    Rn_all = so3.project(R_all @ so3.exp(W_all))           # (3+NG, 3, 3)

    X = s.X._replace(
        Rsb=Rn_all[0],
        Tsb=s.X.Tsb + err[L.TSB:L.TSB + 3],
        Vsb=s.X.Vsb + err[L.VSB:L.VSB + 3],
        bg=s.X.bg + err[L.BG:L.BG + 3],
        ba=s.X.ba + err[L.BA:L.BA + 3],
        Rbc=Rn_all[1],
        Tbc=s.X.Tbc + err[L.TBC:L.TBC + 3],
        Rsg=Rn_all[2],
        td=s.X.td + err[L.TD],
        Cg=s.X.Cg + err[L.CG:L.CG + 9].reshape(3, 3),
        Ca=s.X.Ca + so3.upper_tri_from6(err[L.CA:L.CA + 6]))

    gr = gr._replace(
        Rsb=jnp.where(instate_g[:, None, None], Rn_all[3:], gr.Rsb),
        Tsb=jnp.where(instate_g[:, None],
                      gr.Tsb + gerr_row[:, 3:], gr.Tsb))

    ferr = err[d.feature_begin:].reshape(d.n_features, 3)
    fr = s.features
    instate_f = fr.sind >= 0
    oh_f = ((jnp.clip(fr.sind, 0, d.n_features - 1)[:, None]
             == jnp.arange(d.n_features)[None, :])
            & instate_f[:, None]).astype(err.dtype)       # (NF, F)
    fr = fr._replace(x=fr.x + oh_f @ ferr)
    return s._replace(X=X, cam=cam, groups=gr, features=fr)


def zero_state_entries(P, keep):
    """Zero rows+columns of P where keep==False (gauge fixing / slot free).

    The reference's covariance surgery (src/estimator.cpp:753-783,
    1382-1389) expressed as one masked outer product. On a square-root
    factor (rectangular) the surgery is one-sided: zeroing row i of S
    zeroes row+column i of P = S S^T.
    """
    k = keep.astype(P.dtype)
    if P.shape[0] != P.shape[1]:
        return P * k[:, None]
    return P * (k[:, None] * k[None, :])
