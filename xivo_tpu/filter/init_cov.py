"""Correlated feature-initialization covariance.

Port of the reference's APPROXIMATE_INIT_COVARIANCE capability
(src/feature.cpp RefineDepth use_hessian block + FillCovarianceBlock
cross terms): a feature's local estimate x was obtained by filtering its
observations THROUGH the current pose/extrinsics/intrinsics estimates,
so its error is correlated with theirs. Ignoring that (the reference's
default) makes the joint state overconfident and lets the calibration
states absorb map-consistency error.

First-order model over the feature's observation history (the surviving
instate-group observations in the adjacency): each stored observation
from instate group g satisfies

    0 ~= Hx dx + Ho do + v,    v ~ N(0, Rtri)

where o = (Wbc, Tbc, cam intrinsics, all group poses) and Ho collects
the extrinsics block, the intrinsics block, the OBSERVING group-pose
block, and the REFERENCE group-pose block (the feature is anchored in
the ref camera frame, so its batch estimate depends on the ref pose
too). Solving the weighted normal equations to first order,

    dx = J do + A Hx^T W v,    J = -(Hx^T W Hx)^{-1} Hx^T W Ho

so the EXACT first-order joint covariance after admitting features
x_1..x_k (independent noises v_i) is

    cov(x_i, z)   = J_i P[o, z]        for every existing state z
    cov(x_i, x_j) = J_i P_oo J_j^T     (i != j)
    cov(x_i, x_i) = S_i + J_i P_oo J_i^T

with S_i the subfilter covariance already placed on the block diagonal
by ``_add_feature_blocks``. This is a congruence

    P' = [[I], [J.]] P [[I], [J.]]^T + blkdiag(0, S)

and therefore unconditionally PSD — including under gauge freezing
(zeroed rows of P contribute zero correlation) and sequential admission
batches (each batch augments the already-correlated P). The earlier
experimental version wrote only the o-columns of the cross row and only
the block-diagonal inflation; the missing cross-feature and
cross-to-everything terms are exactly what made it indefinite e2e.

All measurement blocks follow the FD-validated frame chain of
``features.compute_jacobian`` (Feature::ComputeJacobian,
src/feature.cpp:542-656) with the observing group's stored pose in
place of the current body pose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import cam as cam_mod
from ..geom import so3
from . import layout as L
from .config import VIOConfig
from .features import project_persp, unproject_logz
from .state import VIOState


def obs_jacobian(kind: int, intrin, Rbc, Tbc, Rsbr, Tsbr, Rg, Tg, x,
                 dtype):
    """Blocks of one stored observation: feature x (anchored at ref pose
    Rsbr/Tsbr) reprojected through extrinsics Rbc/Tbc into the camera at
    group pose Rg/Tg. Returns (Hx(2,3), Hc(2,6), Hg(2,6), Hr(2,6),
    Hcam(2,NCAM), good). Same chain and error conventions as
    ``features.compute_jacobian`` (validated against it in
    tests/test_init_cov.py)."""
    Rbc_t = Rbc.T
    Xc, dXc_dx = unproject_logz(x)
    Xbr = Rbc @ Xc + Tbc
    Xs = Rsbr @ Xbr + Tsbr
    Rg_t = Rg.T
    Xb = Rg_t @ (Xs - Tg)
    Xcn = Rbc_t @ (Xb - Tbc)
    good = Xcn[2] > 1e-6
    Xcn_s = jnp.where(good, Xcn, jnp.array([0.0, 0.0, 1.0], dtype))
    xcn, dxcn_dXcn = project_persp(Xcn_s)
    _, dxp_dxcn, dxp_dintrin = cam_mod.project_with_jac(kind, intrin, xcn)
    dxp_dXcn = dxp_dxcn @ dxcn_dXcn
    dXcn_dXs = Rbc_t @ Rg_t
    Hx = dxp_dXcn @ dXcn_dXs @ Rsbr @ Rbc @ dXc_dx
    # extrinsics appear on BOTH sides of the chain: anchor->spatial
    # (through the ref pose) and spatial->current camera
    HWbc = dxp_dXcn @ (so3.hat(Xcn_s)
                       + dXcn_dXs @ Rsbr @ (-Rbc @ so3.hat(Xc)))
    HTbc = dxp_dXcn @ (-Rbc_t + dXcn_dXs @ Rsbr)
    # observing group pose (plays the role of Wsb/Tsb in the chain)
    HWg = dxp_dXcn @ Rbc_t @ so3.hat(Xb)
    HTg = dxp_dXcn @ (-dXcn_dXs)
    # reference group pose
    HWr = dxp_dXcn @ dXcn_dXs @ (-Rsbr @ so3.hat(Xbr))
    HTr = dxp_dXcn @ dXcn_dXs
    Hc = jnp.concatenate([HWbc, HTbc], axis=1)
    Hg = jnp.concatenate([HWg, HTg], axis=1)
    Hr = jnp.concatenate([HWr, HTr], axis=1)
    return Hx, Hc, Hg, Hr, dxp_dintrin, good


def _jac_blocks_fg(kind, intrin, Rbc, Tbc, Rsbr, Tsbr, Rg, Tg, x_s,
                   dtype):
    """All (F, G) observation-jacobian blocks in ~6 fused contractions.

    Same math as ``obs_jacobian`` (pinned equal in
    tests/test_init_cov.py) but expressed over the full (F, G) sweep:
    the nested-vmap form emitted ~12 tiny batched matmuls per pair —
    measured as the bulk of the approximate_init_covariance device cost
    (ARCHITECTURE.md round-5: jacobian math ~1.5 s/rep of the 2.4 s
    overhead). Here every right-hand factor that depends on f only or
    g only is precomputed once, the f x g coupling is four
    (G,3,3)x(F,3,3) einsums, and all seven blocks contract against the
    2x3 pixel projector in ONE batched (F,G,2,3)@(F,G,3,21) matmul.
    """
    F = x_s.shape[0]
    G = Rg.shape[0]
    Rbc_t = Rbc.T

    # per-f quantities
    Xc, dXc_dx = jax.vmap(unproject_logz)(x_s)             # (F,3),(F,3,3)
    Xbr = Xc @ Rbc.T + Tbc                                  # (F,3)
    Xs = jnp.einsum("fij,fj->fi", Rsbr, Xbr) + Tsbr         # (F,3)
    A = jnp.einsum("fij,jk,fkl->fil", Rsbr, Rbc, dXc_dx)    # (F,3,3)
    E = -jnp.einsum("fij,jk,fkl->fil", Rsbr, Rbc,
                    jax.vmap(so3.hat)(Xc))                  # (F,3,3)
    Wr = -jnp.einsum("fij,fjk->fik", Rsbr,
                     jax.vmap(so3.hat)(Xbr))                # (F,3,3)

    # per-g quantities
    Bc = jnp.einsum("ji,gkj->gik", Rbc, Rg)                 # Rbc^T Rg^T

    # per-(f,g) geometry
    Xb = jnp.einsum("gji,fgj->fgi", Rg,
                    Xs[:, None, :] - Tg[None, :, :])        # (F,G,3)
    Xcn = jnp.einsum("ji,fgj->fgi", Rbc, Xb - Tbc[None, None, :])
    good = Xcn[..., 2] > 1e-6
    Xcn_s = jnp.where(good[..., None], Xcn,
                      jnp.asarray([0.0, 0.0, 1.0], dtype))

    flat = Xcn_s.reshape(F * G, 3)
    xcn, dxcn_dXcn = jax.vmap(project_persp)(flat)
    _, dxp_dxcn, dxp_dintrin = jax.vmap(
        lambda v: cam_mod.project_with_jac(kind, intrin, v))(xcn)
    P = jnp.einsum("nij,njk->nik", dxp_dxcn,
                   dxcn_dXcn).reshape(F, G, 2, 3)           # pixel proj
    dint = dxp_dintrin.reshape(F, G, 2, -1)

    # f x g coupled right-hand factors (Bc_g @ X_f)
    CA = jnp.einsum("gij,fjk->fgik", Bc, A)
    CE = jnp.einsum("gij,fjk->fgik", Bc, E)
    CRs = jnp.einsum("gij,fjk->fgik", Bc, Rsbr)
    CWr = jnp.einsum("gij,fjk->fgik", Bc, Wr)
    hat_Xcn = jax.vmap(jax.vmap(so3.hat))(Xcn_s)            # (F,G,3,3)
    hat_Xb = jnp.einsum("ij,fgjk->fgik", Rbc_t,
                        jax.vmap(jax.vmap(so3.hat))(Xb))
    BcB = jnp.broadcast_to(Bc[None], (F, G, 3, 3))

    # right-factor stack: [Hx | HWbc HTbc | HWg HTg | HWr HTr] -> 21 cols
    R_all = jnp.concatenate([
        CA,                                                # Hx
        hat_Xcn + CE,                                      # HWbc
        -Rbc_t[None, None] + CRs,                          # HTbc
        hat_Xb,                                            # HWg
        -BcB,                                              # HTg
        CWr,                                               # HWr
        BcB,                                               # HTr
    ], axis=-1)                                            # (F,G,3,21)
    H_all = jnp.einsum("fgij,fgjk->fgik", P, R_all)        # (F,G,2,21)
    Hx = H_all[..., 0:3]
    Hc = H_all[..., 3:9]
    Hg = H_all[..., 9:15]
    Hr = H_all[..., 15:21]
    return Hx, Hc, Hg, Hr, dint, good


def _obs_blocks_batched(cfg: VIOConfig, s: VIOState, rows):
    """Normal-equation blocks for ALL feature rows at once.

    Returns (N (F,3,3), M (F,3,K)): N_f = sum Hx^T W Hx and
    M_f = sum Hx^T W Ho with K = 6 + NCAM + 6*n_groups, o-layout
    [Wbc Tbc | cam | group slot 0 .. slot G-1].

    Gather-free: all row/group selections are one-hot matmuls
    (``ops.dense.oh_take``). This function runs EVERY frame — the
    admission cond is a select under vmap — and its earlier per-slot
    form carried ~8 traced-index gathers through an F x G sweep, the
    exact pattern the frame-path scatter purge exists to avoid
    (ARCHITECTURE.md).
    """
    from ..ops.dense import oh_take
    d = cfg.dims
    G = d.n_groups
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr, gr = s.features, s.groups
    NFR = fr.fid.shape[0]
    NG = gr.gid.shape[0]

    rowc = jnp.maximum(rows, 0)
    x_s = oh_take(fr.x, rowc, NFR)                         # (F,3)
    gref_raw = oh_take(fr.ref, rowc, NFR)                  # (F,)
    gref = jnp.clip(gref_raw, 0, NG - 1)
    ref_slot = oh_take(gr.sind, gref, NG)                  # (F,)
    ref_ok = (gref_raw >= 0) & (ref_slot >= 0)
    sref = jnp.clip(ref_slot, 0, G - 1)
    # J is built at CURRENT group poses deliberately: it models the
    # statistical correlation of the batch estimate (which was filtered
    # through the current estimates), not the update's linearization.
    # An FEJ-snapshot variant was measured and does NOT change the
    # fej x init-cov ATE interaction (round-5 diag: 0.0178 vs 0.0177)
    Rsbr = oh_take(gr.Rsb, gref, NG)                       # (F,3,3)
    Tsbr = oh_take(gr.Tsb, gref, NG)
    adjrow = oh_take(fr.adj, rowc, NFR)                    # (F,NG)

    grow = s.g2row                                         # (G,)
    growc = jnp.maximum(grow, 0)
    Rg = oh_take(gr.Rsb, growc, NG)                        # (G,3,3)
    Tg = oh_take(gr.Tsb, growc, NG)
    ohg = growc[:, None] == jnp.arange(NG)[None, :]        # (G,NG)
    seen = jnp.any(adjrow[:, None, :] & ohg[None, :, :], axis=-1)
    seen = seen & (grow >= 0)[None, :] & ref_ok[:, None] \
        & (growc[None, :] != gref[:, None])                # (F,G)

    Rbc, Tbc = s.X.Rbc, s.X.Tbc
    Hx, Hc, Hg, Hr, dint, cheir = _jac_blocks_fg(
        kind, s.cam, Rbc, Tbc, Rsbr, Tsbr, Rg, Tg, x_s, dtype)
    # shapes: Hx (F,G,2,3), Hc/Hg/Hr (F,G,2,6), dint (F,G,2,NCAM)

    w = (seen & cheir).astype(dtype)[:, :, None, None]
    Hxw = Hx * w
    W = 1.0 / cfg.subfilter.Rtri
    N = W * jnp.einsum("fgri,fgrj->fij", Hxw, Hxw)
    # M assembled BLOCKWISE: the o-row of observation (f, g) has only
    # four nonzero blocks — extrinsics, intrinsics, the OBSERVING group
    # slot g and the REFERENCE slot sref[f]. The earlier form
    # materialized the dense (F, G, G, 2, 6) group placement tensor and
    # einsum'd (F, G, 2, K) against it EVERY frame (the admission cond
    # is a select under batch vmap) — measured as the bulk of the
    # +2.1 s/rep approximate_init_covariance cost on v5e (round-5
    # profile_fej bisect). Blockwise there is no G^2 tensor at all:
    M_ext = W * jnp.einsum("fgri,fgrj->fij", Hxw, Hc * w)   # (F,3,6)
    if cfg.online_camera_calib:
        M_cam = W * jnp.einsum("fgri,fgrj->fij", Hxw, dint * w)
    else:
        M_cam = jnp.zeros((Hxw.shape[0], 3, L.NCAM), dtype)
    # per observing slot g: Hx^T Hg lands in column block g
    M_obs = W * jnp.einsum("fgri,fgrj->fgij", Hxw, Hg * w)  # (F,G,3,6)
    # reference block: sum over observations, placed at slot sref[f]
    M_ref = W * jnp.einsum("fgri,fgrj->fij", Hxw, Hr * w)   # (F,3,6)
    ohr = (sref[:, None] == jnp.arange(G)[None, :]).astype(dtype)
    M_grp = M_obs + ohr[:, :, None, None] * M_ref[:, None]  # (F,G,3,6)
    M_grp = M_grp.transpose(0, 2, 1, 3).reshape(
        M_grp.shape[0], 3, 6 * G)
    M = jnp.concatenate([M_ext, M_cam, M_grp], axis=-1)     # (F,3,K)

    # the anchor observation itself: reprojection into the ref frame is
    # pose-independent (exactly), pins the (X/Z, Y/Z) components, and
    # couples only to the intrinsics — this is what keeps N well-posed
    # at admission time (the subfilter admits on >=2 observations)
    def anchor(x, ok):
        Xc, dXc_dx = unproject_logz(x)
        xcn_r, dxcn_dXc = project_persp(Xc)
        _, dxp_dxcn_r, dxp_dint_r = cam_mod.project_with_jac(
            kind, s.cam, xcn_r)
        return (dxp_dxcn_r @ dxcn_dXc @ dXc_dx) * ok, dxp_dint_r

    Hx_r, dint_r = jax.vmap(anchor)(x_s, ref_ok.astype(dtype))
    N = N + W * jnp.einsum("fri,frj->fij", Hx_r, Hx_r)
    if cfg.online_camera_calib:
        Ho_r = jnp.zeros(dint_r.shape[:1] + (2, 6 + L.NCAM + 6 * G),
                         dtype)
        Ho_r = Ho_r.at[:, :, 6:6 + L.NCAM].set(dint_r)
        M = M + W * jnp.einsum("fri,frj->fij", Hx_r, Ho_r)
    return N, M


def _init_jacobians(cfg: VIOConfig, s: VIOState, rows, valid):
    """J rows (len,3,K) for the given feature-table rows, zeroed where
    invalid or the normal matrix N is near-singular."""
    dtype = s.P.dtype
    N, M = _obs_blocks_batched(cfg, s, rows)          # (.,3,3),(.,3,K)
    use = valid
    tr = (N[:, 0, 0] + N[:, 1, 1] + N[:, 2, 2]) / 3.0
    # a near-singular N means the observations barely determine x —
    # the batch-LS correlation model is meaningless there; skip.
    # (J = 0 keeps the congruence, so PSD is unaffected either way.)
    # lambda_min(N) > thr tested via Sylvester's criterion on N - thr I
    # (exactly equivalent for symmetric N, closed form): the vmapped
    # 3x3 eigvalsh here was an ITERATIVE XLA eigensolver instantiated
    # F x B times per frame — measured at ~24% of the whole frame wall
    # with this feature on (ARCHITECTURE.md round-4/5)
    eye3 = jnp.eye(3, dtype=dtype)
    Mm = N - (1e-4 * tr)[:, None, None] * eye3[None]
    det2 = Mm[:, 0, 0] * Mm[:, 1, 1] - Mm[:, 0, 1] * Mm[:, 1, 0]
    det3 = (Mm[:, 0, 0] * (Mm[:, 1, 1] * Mm[:, 2, 2]
                           - Mm[:, 1, 2] * Mm[:, 2, 1])
            - Mm[:, 0, 1] * (Mm[:, 1, 0] * Mm[:, 2, 2]
                             - Mm[:, 1, 2] * Mm[:, 2, 0])
            + Mm[:, 0, 2] * (Mm[:, 1, 0] * Mm[:, 2, 1]
                             - Mm[:, 1, 1] * Mm[:, 2, 0]))
    use = use & (Mm[:, 0, 0] > 0) & (det2 > 0) & (det3 > 0)
    # closed-form batched 3x3 inverse (adjugate/det) — no LU under vmap
    Nr = N + (1e-6 * tr + 1e-12)[:, None, None] * eye3[None]
    a, b, c = Nr[:, 0, 0], Nr[:, 0, 1], Nr[:, 0, 2]
    d_, e, f = Nr[:, 1, 0], Nr[:, 1, 1], Nr[:, 1, 2]
    g, h, i = Nr[:, 2, 0], Nr[:, 2, 1], Nr[:, 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d_ * i, a * i - c * g, c * d_ - a * f], -1),
        jnp.stack([d_ * h - e * g, b * g - a * h, a * e - b * d_], -1)],
        axis=-2)
    det = a * co[:, 0, 0] + b * co[:, 1, 0] + c * co[:, 2, 0]
    A = co / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)[:, None, None]
    J = -jnp.einsum("fij,fjk->fik", A, M)                  # (.,3,K)
    return jnp.where(use[:, None, None], J, jnp.zeros_like(J))


def _o_indices(G: int):
    return jnp.asarray(np.concatenate([
        np.arange(L.WBC, L.WBC + 6),
        np.arange(L.CAM, L.CAM + L.NCAM),
        np.arange(L.GROUP_BEGIN, L.GROUP_BEGIN + 6 * G)]))


def add_init_correlations(cfg: VIOConfig, s: VIOState, new_slot_mask,
                          row_of_slot) -> VIOState:
    """Augment P with the exact first-order correlations of new slots.

    When ``cfg.init_corr_chunk`` is set, the admission cohort is
    compacted and processed in while_loop chunks of that width instead
    of sweeping all F slots — in steady state one chunk covers the whole
    cohort, cutting the dominant F x G obs-jacobian sweep to A x G.
    Chunking is EXACT: chunks write only feature rows of the factor /
    covariance, so the o-rows feeding J are untouched (sqrt form), and
    in dense form the per-chunk P_o re-read contains precisely the
    earlier chunks' cross columns, i.e. the pairwise J_i P_oo J_j^T
    terms (pinned vs the single pass in tests/test_init_cov.py)."""
    d = cfg.dims
    F = d.n_features
    G = d.n_groups
    dtype = s.P.dtype
    fb = d.feature_begin

    use0 = new_slot_mask & (row_of_slot >= 0)
    A = int(cfg.init_corr_chunk)
    if A <= 0 or A >= F:
        oidx = _o_indices(G)
        P_o = s.P[oidx]        # (K, D) — rows of the o-block vs everything
        Jf = _init_jacobians(cfg, s, row_of_slot, use0)    # (F,3,K)
        return _apply_congruence_full(cfg, s, Jf, P_o, oidx, fb)

    from ..ops.dense import oh_take
    oidx = _o_indices(G)
    order = jnp.cumsum(use0.astype(jnp.int32)) - 1         # (F,)
    count = jnp.sum(use0.astype(jnp.int32))
    ohc = (order[None, :] == jnp.arange(F)[:, None]) & use0[None, :]
    comp_slots = jnp.argmax(ohc, axis=1).astype(jnp.int32)  # (F,)
    n_chunks = (count + A - 1) // A
    ar = jnp.arange(A)

    def body(carry):
        c, P = carry
        pos = c * A + ar
        slot_raw = oh_take(comp_slots, jnp.clip(pos, 0, F - 1), F)
        slot = jnp.where(pos < count, slot_raw, -1)        # (A,)
        slotc = jnp.clip(slot, 0, F - 1)
        rows = oh_take(row_of_slot, slotc, F)              # (A,)
        valid = (slot >= 0) & (rows >= 0)
        Jf = _init_jacobians(cfg, s._replace(P=P), rows, valid)  # (A,3,K)
        P_o = P[oidx]
        C = jnp.einsum("aik,kd->aid", Jf, P_o)             # (A,3,D)
        ohp = ((slotc[None, :] == jnp.arange(F)[:, None])
               & valid[None, :]).astype(dtype)             # (F,A)
        Cf = jnp.einsum("fa,aid->fid", ohp, C).reshape(3 * F, P.shape[1])
        if cfg.covariance_form == "sqrt":
            return c + 1, P.at[fb:, :].add(Cf)
        P_oo = P_o[:, oidx]
        Q = jnp.einsum("aik,kl->ail", Jf, P_oo)
        Xa = jnp.einsum("ail,bjl->aibj", Q, Jf)            # (A,3,A,3)
        Xf = jnp.einsum("fa,aibj->fibj", ohp, Xa)
        Xf = jnp.einsum("gb,fibj->figj", ohp, Xf).reshape(3 * F, 3 * F)
        P = P.at[fb:, :].add(Cf)
        P = P.at[:, fb:].add(Cf.T)
        P = P.at[fb:, fb:].add(Xf)
        P = 0.5 * (P + P.T)
        return c + 1, P

    _, P = jax.lax.while_loop(
        lambda carry: carry[0] < n_chunks, body,
        (jnp.zeros((), jnp.int32), s.P))
    return s._replace(P=P)


def _apply_congruence_full(cfg: VIOConfig, s: VIOState, Jf, P_o, oidx,
                           fb) -> VIOState:
    d = cfg.dims
    F = d.n_features
    if cfg.covariance_form == "sqrt":
        # on the factor the congruence [[I],[J.]] is a plain ROW
        # transform: new rows += J @ S[o-rows]. Cross terms to every
        # state, pairwise new-new blocks, and PSD-ness all follow from
        # P = S S^T — one line replaces the three dense adds below.
        C = jnp.einsum("fik,kd->fid", Jf, P_o).reshape(3 * F, -1)
        return s._replace(P=s.P.at[fb:, :].add(C))
    P_oo = P_o[:, oidx]        # (K, K)
    # cross rows vs EVERY existing state: J P[o, :]. Columns landing in
    # new feature slots are zero here (their P rows were zeroed before
    # the block-diagonal insert), so the pairwise term below is not
    # double counted; columns in old feature slots make the (fb:, fb:)
    # direct+transpose adds land on symmetric entries exactly once each.
    C = jnp.einsum("fik,kd->fid", Jf, P_o).reshape(3 * F, d.full)
    # pairwise new-new blocks J_i P_oo J_j^T (diagonal = inflation)
    Q = jnp.einsum("fik,kl->fil", Jf, P_oo)
    X = jnp.einsum("fil,gjl->figj", Q, Jf).reshape(3 * F, 3 * F)

    P = s.P.at[fb:, :].add(C)
    P = P.at[:, fb:].add(C.T)
    P = P.at[fb:, fb:].add(X)
    P = 0.5 * (P + P.T)
    return s._replace(P=P)
