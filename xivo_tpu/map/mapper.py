"""Sparse map + loop closure.

Re-design of the reference Mapper (src/mapper.{h,cpp}): retired features
live in a fixed-capacity device table; loop-closure candidates come from
EXACT batched Hamming matching of BRIEF descriptors (a deliberate
departure from DBoW2 — the vocabulary tree only exists to prune CPU
search; on TPU the full query x map distance matrix is a single
XOR+popcount einsum and strictly better recall); geometric verification
is the vectorized P3P RANSAC; accepted matches become EKF rows against
the current pose (CloseLoopInternal, src/update.cpp:171-210).

Sharding note (SURVEY §2.6): the map table is the natural shard axis for
multi-chip retrieval — each device scores its slice and a psum-argmin
picks global nearest neighbors. Single-chip path here; the sharded
variant lives in dist/.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..filter import layout as L
from ..filter.config import VIOConfig
from ..filter.features import project_persp, unproject_logz
from ..filter.state import VIOState
from ..frontend import brief
from ..geom import so3
from .p3p import pnp_ransac


class MapState(NamedTuple):
    Xs: jnp.ndarray        # (M,3) landmark positions (spatial frame)
    cov: jnp.ndarray       # (M,3,3) landmark position covariance
    desc: jnp.ndarray      # (M,8) uint32 BRIEF
    gid: jnp.ndarray       # (M,) int32 anchor group id at retirement
    epoch: jnp.ndarray     # (M,) int32 vision_counter at insertion —
                           # close_loop only matches entries older than
                           # lc_min_age_frames (recent entries restate
                           # information the filter already has)
    valid: jnp.ndarray     # (M,)
    write_ptr: jnp.ndarray  # () int32 ring pointer
    count: jnp.ndarray      # () int32 total inserted (diagnostic)
    n_merged: jnp.ndarray   # () int32 fusion events (diagnostic)


def init_map(capacity: int = 20000, dtype=jnp.float32) -> MapState:
    return MapState(
        Xs=jnp.zeros((capacity, 3), dtype),
        cov=jnp.zeros((capacity, 3, 3), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        gid=jnp.full((capacity,), -1, jnp.int32),
        epoch=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        write_ptr=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
        n_merged=jnp.asarray(0, jnp.int32))


def _inv3(A):
    """Closed-form 3x3 inverse (adjugate/det) — batched, no LU."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1)],
        axis=-2)
    det = a * co[..., 0, 0] + b * co[..., 1, 0] + c * co[..., 2, 0]
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return co / det[..., None, None]


def map_insert(ms: MapState, Xs, desc, valid, cov=None, gid=None,
               nn_dist_thresh: int = -1,
               merge_radius: float = 0.5, epoch=None) -> MapState:
    """Insert a batch of retired landmarks, FUSING re-retired ones.

    Merge-on-retirement parity (src/mapper.cpp:158-222 +
    Feature::Merge, src/feature.cpp:187-208): a new landmark whose
    descriptor matches an existing map entry (Hamming < nn_dist_thresh)
    within merge_radius meters is covariance-weighted fused into it —
    the map entry count stays flat and its variance SHRINKS — instead
    of duplicating in the ring. nn_dist_thresh < 0 disables fusion
    (plain ring insert).
    """
    M = ms.Xs.shape[0]
    dtype = ms.Xs.dtype
    Xs = Xs.astype(dtype)
    if cov is None:
        # legacy/exact-landmark callers: zero covariance = flat Rlc in
        # close_loop and first-observation-wins fusion
        cov = jnp.zeros((Xs.shape[0], 3, 3), dtype)
    cov = cov.astype(dtype)
    if gid is None:
        gid = jnp.full((Xs.shape[0],), -1, jnp.int32)
    if epoch is None:
        epoch = jnp.zeros((), jnp.int32)
    epoch = jnp.broadcast_to(jnp.asarray(epoch, jnp.int32),
                             (Xs.shape[0],))

    if nn_dist_thresh >= 0:
        D = brief.hamming_matrix(desc, ms.desc)               # (n, M)
        D = jnp.where(ms.valid[None, :], D, 10_000)
        nn = jnp.argmin(D, axis=1)
        nnc = jnp.clip(nn, 0, M - 1)
        nnd = jnp.min(D, axis=1)
        close = jnp.linalg.norm(Xs - ms.Xs[nnc], axis=1) < merge_radius
        merge = valid & (nnd < nn_dist_thresh) & close
        # dedup per target: several same-batch retirees matching the
        # same map entry would be last-write-wins on the scatter below,
        # each fused against the ORIGINAL P1 — all but one measurement
        # silently lost (advisor r2). Keep the lowest-Hamming candidate
        # per target (ties -> lowest row); losers insert as new entries.
        n = Xs.shape[0]
        idx = jnp.arange(n)
        same_tgt = merge[:, None] & merge[None, :] \
            & (nnc[:, None] == nnc[None, :])
        beaten = same_tgt & ((nnd[None, :] < nnd[:, None])
                             | ((nnd[None, :] == nnd[:, None])
                                & (idx[None, :] < idx[:, None])))
        merge = merge & ~jnp.any(beaten, axis=1)
        # covariance-weighted fusion: x+ = x1 + P1 (P1+P2)^-1 (x2 - x1),
        # P+ = P1 - P1 (P1+P2)^-1 P1  (information-form fusion without
        # inverting the individual covariances)
        P1 = ms.cov[nnc]
        # regularized fusion gain: degenerate covariances (gauge-frozen
        # features retire with EXACTLY zero XY blocks) make P1+P2
        # singular — the clamped adjugate inverse then produces ~1e29
        # gains and a garbage map position that NaNs the next closure.
        # The jitter keeps K -> 0 there (first-observation-wins), which
        # is the correct degenerate limit.
        S12 = P1 + cov
        tr12 = (S12[..., 0, 0] + S12[..., 1, 1] + S12[..., 2, 2]) / 3.0
        rel = 1e-9 if dtype == jnp.float64 else 1e-5
        eps = (rel * tr12 + jnp.asarray(1e-12, dtype))[..., None, None]
        K = jnp.einsum("nij,njk->nik", P1,
                       _inv3(S12 + eps * jnp.eye(3, dtype=dtype)))
        x_f = ms.Xs[nnc] + jnp.einsum("nij,nj->ni", K, Xs - ms.Xs[nnc])
        # Joseph-form fused covariance: (I-K) P1 (I-K)^T + K P2 K^T —
        # structurally PSD where the short form P1 - K P1 loses
        # definiteness to rounding after hundreds of re-fusions (the
        # stable-descriptor worlds re-fuse every keyframe)
        eye3 = jnp.eye(3, dtype=dtype)
        IK = eye3[None] - K
        P_f = jnp.einsum("nij,njk,nlk->nil", IK, P1, IK) \
            + jnp.einsum("nij,njk,nlk->nil", K, cov, K)
        P_f = 0.5 * (P_f + jnp.swapaxes(P_f, -1, -2))
        tgt_m = jnp.where(merge, nnc, M)                      # trash drop
        ms = ms._replace(
            Xs=ms.Xs.at[tgt_m].set(x_f),
            cov=ms.cov.at[tgt_m].set(P_f),
            desc=ms.desc.at[tgt_m].set(desc),   # freshest view wins
            # epoch is BIRTH time, never refreshed by fusion: the fused
            # position stays dominated by the established entry (P1
            # weighting), and refreshing would let continuous keyframe
            # re-insertion of live tracks keep their entries eternally
            # young — lc_min_age_frames could then never mature for
            # stable-descriptor worlds (id-derived PCW descriptors, or
            # well-tracked marker tiles) and loop closure would starve
            n_merged=ms.n_merged + jnp.sum(merge.astype(jnp.int32)))
        valid = valid & ~merge

    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, (ms.write_ptr + rank) % M, M)
    return ms._replace(
        Xs=ms.Xs.at[tgt].set(Xs),
        cov=ms.cov.at[tgt].set(cov),
        desc=ms.desc.at[tgt].set(desc),
        gid=ms.gid.at[tgt].set(gid),
        epoch=ms.epoch.at[tgt].set(epoch),
        valid=ms.valid.at[tgt].set(True),
        write_ptr=(ms.write_ptr + jnp.sum(valid.astype(jnp.int32))) % M,
        count=ms.count + jnp.sum(valid.astype(jnp.int32)))


def detect_loop_closures(cfg: VIOConfig, s: VIOState, ms: MapState,
                         nn_dist_thresh: int = 30,
                         ransac_thresh: float = 0.03,
                         min_matches: int = 5,
                         matcher=None):
    """Descriptor matching + P3P verification.

    Mirrors Mapper::DetectLoopClosures (src/mapper.cpp:335-418). Returns
    (match_rows (F,), map_idx (F,), match_ok (F,), any_loop ()).
    Queries are the current instate features.

    `matcher` (optional): a sharded NN matcher from
    dist/retrieval.make_sharded_matcher — pass it (with ms's landmark
    tables device_put with the matching landmark sharding) when the map
    exceeds one chip's HBM; the single-chip einsum is used otherwise.
    """
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    F = cfg.dims.n_features
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    def per_slot(slot):
        row = s.f2row[slot]
        ok = row >= 0
        rowc = jnp.maximum(row, 0)
        d = fr.desc[rowc]
        xp = fr.xp[rowc]
        return d, xp, ok, rowc

    qdesc, qxp, qok, qrow = jax.vmap(per_slot)(jnp.arange(F))

    # age gate: a map entry inserted moments ago restates information
    # the filter still holds — matching it would double-count. Only
    # entries at least lc_min_age_frames old are loop-closure targets.
    mvalid = ms.valid
    if cfg.lc_min_age_frames > 0:
        mvalid = mvalid & (ms.epoch
                           <= s.vision_counter - cfg.lc_min_age_frames)
    if matcher is None:
        D = brief.hamming_matrix(qdesc, ms.desc)      # (F, M)
        D = jnp.where(mvalid[None, :], D, 10_000)
        nn = jnp.argmin(D, axis=1)
        nnd = jnp.min(D, axis=1)
    else:
        nn, nnd = matcher(qdesc, ms.desc, mvalid)
    match = qok & (nnd < nn_dist_thresh)
    n_match = jnp.sum(match.astype(jnp.int32))

    # bearings of the query pixels in the current camera frame
    def bearing(xp):
        xcn = cam_mod.unproject(kind, s.cam, xp)
        v = jnp.concatenate([xcn, jnp.ones((1,), xcn.dtype)])
        return v / jnp.linalg.norm(v)

    bear = jax.vmap(bearing)(qxp)
    Xw = ms.Xs[jnp.clip(nn, 0, ms.Xs.shape[0] - 1)].astype(bear.dtype)

    key, subkey = jax.random.split(s.key)
    R, t, inl, okr = pnp_ransac(subkey, Xw, bear, match,
                                inlier_thresh=ransac_thresh,
                                min_inliers=min_matches)
    good = (n_match >= min_matches) & okr
    inlier = match & inl & good
    # the reference discards when <= 4 geometric inliers survive
    enough = jnp.sum(inlier.astype(jnp.int32)) > 4
    inlier = inlier & enough
    return qrow, nn, inlier, jnp.any(inlier), key


def close_loop(cfg: VIOConfig, s: VIOState, ms: MapState,
               **detect_kw) -> Tuple[VIOState, jnp.ndarray]:
    """Full CloseLoop step: detect + EKF rows against the current pose.

    The reference anchors LC rows at the newest group's slot
    (src/update.cpp:171-210); the newest group's pose IS the current body
    pose, so we take the Jacobians w.r.t. (Wsb, Tsb, Wbc, Tbc) directly —
    identical measurement model, well-defined slots. Two fidelity points
    beyond the basic rows:

    * the measurement noise is Rlc PLUS the matched landmark's own
      position covariance projected into pixels (diagonal approximation)
      — a well-known old landmark pulls hard, a fuzzy one barely
      (replaces the flat Rlc of round 1);
    * the anchor-pose block (ComputeLCJacobian's matched-group
      derivative, src/oos.cpp:92-145) is OFF by default
      (cfg.lc_anchor_rows=False): map landmarks here are stored in the
      WORLD frame, so once merged their position no longer depends on
      the anchor pose and the block would inject a spurious
      correlation. The knob re-enables the rows for A/B study when the
      anchor group is still in the EKF window.
    """
    from ..filter.update import absorb_error, measurement_update

    F = cfg.dims.n_features
    G = cfg.dims.n_groups
    D = cfg.dims.full
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]

    qrow, nn, inlier, any_loop, key = detect_loop_closures(
        cfg, s, ms, **detect_kw)
    s = s._replace(key=key)

    Rbc_t = s.X.Rbc.T
    Rsb_t = s.X.Rsb.T
    Mcap = ms.Xs.shape[0]
    nnc = jnp.clip(nn, 0, Mcap - 1)
    # anchor-group lookup by gid (alive = still an instate group)
    agid = ms.gid[nnc]                                        # (F,)
    eq = (agid[:, None] == gr.gid[None, :]) & (agid >= 0)[:, None] \
        & (gr.gid >= 0)[None, :]
    has_anchor = jnp.any(eq, axis=1)
    arow = jnp.argmax(eq, axis=1)
    arowc = jnp.clip(arow, 0, NG - 1)
    aslot = jnp.where(has_anchor, gr.sind[arowc], -1)
    alive = has_anchor & (aslot >= 0)

    def lc_row(slot):
        row = qrow[slot]
        use = inlier[slot]
        Xs_old = ms.Xs[nnc[slot]].astype(dtype)
        cov_w = ms.cov[nnc[slot]].astype(dtype)
        xp_meas = fr.xp[row]
        Xb = Rsb_t @ (Xs_old - s.X.Tsb)
        Xcn = Rbc_t @ (Xb - s.X.Tbc)
        front = Xcn[2] > 1e-6
        Xcn_s = jnp.where(front, Xcn, jnp.array([0.0, 0.0, 1.0], dtype))
        xcn, dxcn_dXcn = project_persp(Xcn_s)
        xp_pred, dxp_dxcn, _ = cam_mod.project_with_jac(kind, s.cam, xcn)
        dxp_dXcn = dxp_dxcn @ dxcn_dXcn
        dXcn_dXs = Rbc_t @ Rsb_t
        Hxs = dxp_dXcn @ dXcn_dXs                             # (2,3)
        H = jnp.zeros((2, D), dtype)
        H = H.at[:, L.WSB:L.WSB + 3].set(dxp_dXcn @ Rbc_t @ so3.hat(Xb))
        H = H.at[:, L.TSB:L.TSB + 3].set(-Hxs)
        H = H.at[:, L.WBC:L.WBC + 3].set(dxp_dXcn @ so3.hat(Xcn_s))
        H = H.at[:, L.TBC:L.TBC + 3].set(dxp_dXcn @ (-Rbc_t))
        # anchor-pose block (landmark re-expressed in the live anchor)
        Rg = gr.Rsb[arowc[slot]]
        Tg = gr.Tsb[arowc[slot]]
        Xb_a = Rg.T @ (Xs_old - Tg)
        aw = (alive[slot] & use).astype(dtype) \
            if cfg.lc_anchor_rows else jnp.zeros((), dtype)
        HW_a = Hxs @ (-Rg @ so3.hat(Xb_a)) * aw
        HT_a = Hxs * aw
        Hg = jnp.concatenate([HW_a, HT_a], axis=1)            # (2,6)
        # measurement variance: Rlc + projected landmark uncertainty
        # (clamped: the fused map covariance is PSD only to rounding, a
        # slightly negative projection must not make S indefinite)
        Rrow = cfg.Rlc + jnp.maximum(
            jnp.diagonal(Hxs @ cov_w @ Hxs.T), 0.0)
        inn = xp_meas - xp_pred
        w = (use & front).astype(dtype)
        return (H * w, Hg * w, jnp.clip(aslot[slot], 0, G - 1),
                inn * w, Rrow, use & front)

    H, Hg, gslot, inn, Rrow, rv = jax.vmap(lc_row)(jnp.arange(F))
    # scatter anchor blocks at their group slots (one-hot, trash-safe)
    oh = jax.nn.one_hot(gslot, G, dtype=dtype) \
        * (jnp.any(jnp.abs(Hg) > 0, axis=(1, 2)))[:, None]
    Hgrp = jnp.einsum("fg,frk->frgk", oh, Hg).reshape(F, 2, 6 * G)
    H = H.reshape(F, 2, D).at[:, :, L.GROUP_BEGIN:L.GROUP_BEGIN + 6 * G
                              ].add(Hgrp).reshape(2 * F, D)
    inn = inn.reshape(2 * F)
    diagR = Rrow.reshape(2 * F).astype(dtype)
    if cfg.lc_MH_thresh > 0:
        # chi-square gate on the LC innovations (robustness beyond the
        # reference, which applies matched rows ungated: a descriptor
        # match that survives P3P can still disagree violently with the
        # filter — e.g. aliased texture — and one such row can bend the
        # whole trajectory; the per-row Mahalanobis test keeps only
        # closures consistent with the state to lc_MH_thresh)
        idx = jnp.arange(F)
        if s.P.shape[0] != s.P.shape[1]:
            from ..filter.sqrt_form import factor_innovation_blocks
            b00, b01, b11 = factor_innovation_blocks(s.P, H)
        else:
            HP = H @ s.P
            Sf = HP @ H.T
            b00 = Sf[2 * idx, 2 * idx]
            b01 = Sf[2 * idx, 2 * idx + 1]
            b11 = Sf[2 * idx + 1, 2 * idx + 1]
        S00 = b00 + diagR[2 * idx]
        S01 = b01
        S11 = b11 + diagR[2 * idx + 1]
        r0, r1 = inn[2 * idx], inn[2 * idx + 1]
        det = S00 * S11 - S01 * S01
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dist = (S11 * r0 * r0 - 2.0 * S01 * r0 * r1
                + S00 * r1 * r1) / det
        rv = rv & (dist < cfg.lc_MH_thresh)
    err, P = measurement_update(s.P, H, inn, diagR, rv)
    do = jnp.any(rv)
    err = jnp.where(do, err, 0.0)
    P = jnp.where(do, P, s.P)
    s = absorb_error(cfg, s._replace(P=P), err)
    return s, jnp.sum(rv.astype(jnp.int32))


def retire_features(cfg: VIOConfig, s: VIOState, ms: MapState,
                    row_mask) -> MapState:
    """Push features (by table row) into the map with their spatial
    positions, POSITION COVARIANCE, anchor group id and descriptors.

    The landmark covariance is the feature's EKF (or subfilter) block
    pushed through the local->world chain, first order in the feature
    state (Mapper::AddFeature with Feature covariance,
    src/mapper.cpp:158-240); anchor-pose uncertainty is not folded in
    (documented approximation — it is shared across co-retired
    landmarks and largely common-mode for loop closure).
    """
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    d = cfg.dims
    grow = jnp.clip(fr.ref, 0, NG - 1)
    dtype = fr.x.dtype

    # per-row 3x3 feature-block covariance: EKF block for instate rows
    # (one-hot over slots; sqrt form reconstructs from factor rows),
    # subfilter Psub otherwise
    fb = d.feature_begin
    F = d.n_features
    if s.P.shape[0] != s.P.shape[1]:
        rows3 = s.P[fb:fb + 3 * F].reshape(F, 3, -1)
        blocks = jnp.einsum("fik,fjk->fij", rows3, rows3)    # (F,3,3)
    else:
        Pf = s.P[fb:fb + 3 * F, fb:fb + 3 * F]
        blocks = jnp.stack([Pf[3 * k:3 * k + 3, 3 * k:3 * k + 3]
                            for k in range(F)])
    slot = jnp.clip(fr.sind, 0, F - 1)
    oh = (slot[:, None] == jnp.arange(F)[None, :]) \
        & (fr.sind >= 0)[:, None]
    Pblk = jnp.einsum("rf,fij->rij", oh.astype(dtype),
                      blocks.astype(dtype))
    Pblk = jnp.where((fr.sind >= 0)[:, None, None], Pblk, fr.Psub)

    def one(row):
        Xc, dXc_dx = unproject_logz(fr.x[row])
        R = gr.Rsb[grow[row]]
        T = gr.Tsb[grow[row]]
        Xs = R @ (s.X.Rbc @ Xc + s.X.Tbc) + T
        J = R @ s.X.Rbc @ dXc_dx                             # (3,3)
        return Xs, J @ Pblk[row] @ J.T

    Xs, cov = jax.vmap(one)(jnp.arange(fr.fid.shape[0]))
    gid = jnp.where(fr.ref >= 0, gr.gid[grow], -1)
    ok = row_mask & (fr.ref >= 0)
    return map_insert(ms, Xs, fr.desc, ok, cov=cov, gid=gid,
                      nn_dist_thresh=(cfg.lc_nn_dist_thresh
                                      if cfg.map_merge_on_retire else -1),
                      merge_radius=cfg.map_merge_radius,
                      epoch=s.vision_counter)
