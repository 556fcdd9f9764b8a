"""The per-frame VIO pipeline as one pure jitted function.

This is the TPU-native re-design of the reference's UpdateStep /
ProcessTracks / SelectAndAddNewFeatures / OutlierRejection machinery
(``src/manager.cpp``, ``src/update.cpp``): every list mutation, pointer
walk, and covariance surgery becomes a masked operation over the
fixed-capacity tables in ``VIOState``. The whole thing — IMU scan,
tracker association, subfilters, admission, gating, Joseph update, group
lifecycle — compiles to a single XLA program per frame, scans over frames
and vmaps over sequences.

Slot/row conventions: "row" indexes the feature/group tables (graph
capacity); "slot" indexes the EKF window (n_features/n_groups). Scatters
to row index == table size are dropped (out-of-bounds scatter semantics),
which we use as a trash target for masked writes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from ..ops.dense import oh_take as _oh_take
from ..ops.dense import HIGHEST
from . import layout as L
from .config import VIOConfig
from .features import (change_owner, predict_pixel, subfilter_update_table,
                       triangulate_two_view_checked, unproject_logz)
from .propagate import imu_sample_update, propagate_state
from .state import (FS_CREATED, FS_EMPTY, FS_GAUGE, FS_INITIALIZING,
                    FS_INSTATE, FS_READY, TS_CREATED, TS_DROPPED, TS_NONE,
                    TS_TRACKED, FeatureTable, GroupTable, VIOState)
from .update import (absorb_error, build_stacked_jacobian,
                     huber_robustify_R, joseph_update, measurement_update,
                     mh_distances, mh_gate, zero_state_entries)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _rank_by_key(valid_mask, order_key):
    """Stable ascending rank of each item among ALL items (invalid items
    get key=+inf). Sort-free: a pairwise comparison matrix (the argsort +
    inverse-permutation-scatter formulation serializes on TPU; an N^2
    bool reduce is fully parallel and ~free at table sizes)."""
    N = valid_mask.shape[0]
    key = jnp.where(valid_mask, order_key, jnp.inf)
    idx = jnp.arange(N)
    before = (key[None, :] < key[:, None]) \
        | ((key[None, :] == key[:, None]) & (idx[None, :] < idx[:, None]))
    return jnp.sum(before, axis=1).astype(jnp.int32), before


def _rank_assign(free_mask, want_mask, order_key):
    """Assign wanted items to free slots in priority order.

    free_mask: (S,) free slots; want_mask: (N,) items wanting a slot;
    order_key: (N,) smaller = higher priority. Returns (slot_of_item (N,),
    got_mask (N,)): slot_of_item[i] is the assigned slot or S (trash).
    Scatter/sort-free (one-hot matching), per the scatter-purge rule.
    """
    S = free_mask.shape[0]
    rank_of_item, _ = _rank_by_key(want_mask, order_key)
    # the rank-th free slot in slot-index order, matched one-hot
    free_rank = jnp.cumsum(free_mask.astype(jnp.int32)) - 1   # (S,)
    n_free = jnp.sum(free_mask.astype(jnp.int32))
    got = want_mask & (rank_of_item < n_free)
    match = free_mask[None, :] & (free_rank[None, :] == rank_of_item[:, None])
    slot_i = jnp.sum(match * jnp.arange(S, dtype=jnp.int32)[None, :],
                     axis=1, dtype=jnp.int32)
    slot = jnp.where(got, slot_i, S)
    return slot.astype(jnp.int32), got


def _place_one_hot(tgt_slot, n_slots, old_map):
    """One-hot replacement for ``old_map.at[tgt_slot].set(arange(N))``
    with a trash index == n_slots: returns (new_map, hit_mask, row_of_slot)
    where row_of_slot is -1 on unhit slots."""
    N = tgt_slot.shape[0]
    oh = tgt_slot[:, None] == jnp.arange(n_slots, dtype=jnp.int32)[None, :]
    hit = jnp.any(oh, axis=0)
    rowidx = jnp.sum(oh * jnp.arange(N, dtype=jnp.int32)[:, None], axis=0,
                     dtype=jnp.int32)
    new_map = jnp.where(hit, rowidx, old_map)
    return new_map, hit, jnp.where(hit, rowidx, -1)


def _feature_keep_vector(cfg: VIOConfig, slot_mask, dtype):
    """(D,) keep-vector that zeroes the 3 entries of each masked feature slot."""
    d = cfg.dims
    keep = jnp.ones((d.full,), dtype)
    block = jnp.repeat(slot_mask, 3)               # (3F,)
    keep = keep.at[d.feature_begin:].set(jnp.where(block, 0.0, 1.0))
    return keep


def _group_keep_vector(cfg: VIOConfig, slot_mask, dtype):
    d = cfg.dims
    keep = jnp.ones((d.full,), dtype)
    block = jnp.repeat(slot_mask, 6)               # (6G,)
    keep = keep.at[L.GROUP_BEGIN:L.GROUP_BEGIN + 6 * d.n_groups].set(
        jnp.where(block, 0.0, 1.0))
    return keep


def _clear_feature_rows(fr: FeatureTable, mask) -> FeatureTable:
    """Reset table rows where mask is True (Feature::Destroy parity)."""
    m = mask
    return fr._replace(
        fid=jnp.where(m, -1, fr.fid),
        status=jnp.where(m, FS_EMPTY, fr.status),
        track=jnp.where(m, TS_NONE, fr.track),
        ref=jnp.where(m, -1, fr.ref),
        sind=jnp.where(m, -1, fr.sind),
        init_counter=jnp.where(m, 0, fr.init_counter),
        lifetime=jnp.where(m, 0, fr.lifetime),
        outlier_counter=jnp.where(m, 0.0, fr.outlier_counter),
        tri_ok=jnp.where(m, False, fr.tri_ok),
        adj=jnp.where(m[:, None], False, fr.adj),
        sim_depth=jnp.where(m, -1.0, fr.sim_depth),
    )


def _remove_features_from_state(cfg: VIOConfig, s: VIOState, row_mask):
    """Free EKF slots of the masked feature rows + zero their covariance.

    Port of RemoveFeatureFromState (src/estimator.cpp:762-783).
    """
    fr = s.features
    hit = row_mask & (fr.sind >= 0)
    # slot mask of the hit rows, one-hot (no traced-index scatter)
    slot_mask = jnp.any(
        hit[:, None] & (fr.sind[:, None]
                        == jnp.arange(cfg.dims.n_features)[None, :]), axis=0)
    P = zero_state_entries(
        s.P, _feature_keep_vector(cfg, slot_mask, s.P.dtype) > 0)
    f2row = jnp.where(slot_mask, -1, s.f2row)
    fr = fr._replace(sind=jnp.where(hit, -1, fr.sind),
                     status=jnp.where(hit, FS_READY, fr.status))
    return s._replace(P=P, f2row=f2row, features=fr)


def _remove_groups_from_state(cfg: VIOConfig, s: VIOState, grow_mask):
    """Free EKF slots of masked group rows (RemoveGroupFromState parity)."""
    gr = s.groups
    hit = grow_mask & (gr.sind >= 0)
    slot_mask = jnp.any(
        hit[:, None] & (gr.sind[:, None]
                        == jnp.arange(cfg.dims.n_groups)[None, :]), axis=0)
    P = zero_state_entries(
        s.P, _group_keep_vector(cfg, slot_mask, s.P.dtype) > 0)
    g2row = jnp.where(slot_mask, -1, s.g2row)
    gr = gr._replace(sind=jnp.where(hit, -1, gr.sind),
                     is_clone=gr.is_clone & ~hit)
    # losing the gauge group resets the gauge (src/estimator.cpp:1320-1324)
    lost_gauge = jnp.any(hit & (jnp.arange(gr.gid.shape[0]) == s.gauge_row))
    gauge_row = jnp.where(lost_gauge, -1, s.gauge_row)
    return s._replace(P=P, g2row=g2row, groups=gr, gauge_row=gauge_row)


# ---------------------------------------------------------------------------
# tracker (POINTCLOUD mode)
# ---------------------------------------------------------------------------

def tracker_pointcloud(cfg: VIOConfig, s: VIOState, meas_id, meas_xp,
                       meas_depth, meas_valid) -> VIOState:
    """Id-keyed synthetic measurement association.

    Port of Tracker::UpdatePointCloud (src/tracker.cpp:632-702): match
    measurement ids to live tracks, update matched tracks (displacement
    check), drop unmatched tracks, create new tracks from unmatched
    measurements up to num_features_max.
    """
    fr = s.features
    NF = fr.fid.shape[0]
    M = meas_id.shape[0]

    active = fr.active
    # (NF, M) equality — ids are unique per side
    eq = (fr.fid[:, None] == meas_id[None, :]) & active[:, None] \
        & meas_valid[None, :]
    has_match = jnp.any(eq, axis=1)
    match_j = jnp.argmax(eq, axis=1)  # (NF,) measurement index
    mj = jnp.clip(match_j, 0, M - 1)
    mxp = _oh_take(meas_xp, mj, M)
    mdepth = _oh_take(meas_depth, mj, M)

    disp_ok = jnp.linalg.norm(mxp - fr.xp, axis=1) \
        < cfg.max_pixel_displacement
    tracked = has_match & disp_ok

    n_rej = jnp.zeros((), jnp.int32)
    if cfg.do_outlier_rejection:
        # homography-consistency rejection for the point-cloud tracker
        # (the reference wires Tracker::OutlierRejection only in LK
        # mode, src/tracker.cpp:705-753; same flag, both modes here)
        from ..frontend.homography import homography_ransac
        key, sub = jax.random.split(s.key)
        s = s._replace(key=key)
        inl, hok = homography_ransac(sub, fr.xp, mxp, tracked,
                                     thresh=cfg.homography_reproj_thresh)
        n_rej = jnp.sum((tracked & ~inl).astype(jnp.int32))
        tracked = tracked & inl
    s = s._replace(n_tracker_rejected=n_rej)

    dropped = active & ~tracked

    fr = fr._replace(
        track=jnp.where(tracked, TS_TRACKED,
                        jnp.where(dropped, TS_DROPPED, fr.track)),
        xp=jnp.where(tracked[:, None], mxp.astype(fr.xp.dtype), fr.xp),
        sim_depth=jnp.where(tracked, mdepth.astype(fr.sim_depth.dtype),
                            fr.sim_depth),
    )

    # measurements already claimed by a track
    claimed = jnp.any(eq & tracked[:, None], axis=0)
    to_create = meas_valid & ~claimed
    # capacity: num_features_max minus surviving tracks
    n_live = jnp.sum(tracked.astype(jnp.int32))
    budget = jnp.maximum(cfg.num_features_max - n_live, 0)
    order = jnp.cumsum(to_create.astype(jnp.int32)) - 1
    to_create = to_create & (order < budget)

    slot_of_meas, got = _rank_assign(
        ~fr.active & ~tracked, to_create,
        jnp.arange(M, dtype=fr.xp.dtype))
    # one-hot placement of the new tracks (no traced-index scatters)
    tgt = jnp.where(got, slot_of_meas, NF)
    oh = tgt[:, None] == jnp.arange(NF, dtype=jnp.int32)[None, :]  # (M, NF)
    hit = jnp.any(oh, axis=0)
    ohf = oh.astype(fr.xp.dtype)
    new_fid = jnp.sum(oh * meas_id.astype(jnp.int32)[:, None], axis=0,
                      dtype=jnp.int32)
    new_xp = jnp.einsum("mf,mk->fk", ohf, meas_xp.astype(fr.xp.dtype),
                         precision=HIGHEST)
    new_depth = ohf.T @ meas_depth.astype(fr.xp.dtype)
    # id-derived descriptors (splitmix32 of fid per word): POINTCLOUD
    # mode has no imagery, but a deterministic unique descriptor per
    # landmark id makes the WHOLE mapper/loop-closure stack (Hamming
    # retrieval, P3P, LC rows) exercisable on the cheap sim — the
    # default-tier kidnap pin rides this (tests/test_headline_micro.py)
    def _splitmix32(x):
        x = (x + jnp.uint32(0x9e3779b9))
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x21f0aaad)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x735a2d97)
        return x ^ (x >> 15)

    words = (new_fid.astype(jnp.uint32)[:, None] * jnp.uint32(8)
             + jnp.arange(8, dtype=jnp.uint32)[None, :])
    new_desc = _splitmix32(words)
    fr = fr._replace(
        fid=jnp.where(hit, new_fid, fr.fid),
        status=jnp.where(hit, FS_CREATED, fr.status),
        track=jnp.where(hit, TS_CREATED, fr.track),
        ref=jnp.where(hit, -1, fr.ref),
        sind=jnp.where(hit, -1, fr.sind),
        init_counter=jnp.where(hit, 0, fr.init_counter),
        lifetime=jnp.where(hit, 0, fr.lifetime),
        outlier_counter=jnp.where(hit, 0.0, fr.outlier_counter),
        xp=jnp.where(hit[:, None], new_xp, fr.xp),
        tri_ok=jnp.where(hit, False, fr.tri_ok),
        adj=jnp.where(hit[:, None], False, fr.adj),
        sim_depth=jnp.where(hit, new_depth, fr.sim_depth),
        desc=jnp.where(hit[:, None], new_desc, fr.desc),
    )
    return s._replace(features=fr)


# ---------------------------------------------------------------------------
# UpdateStep phases
# ---------------------------------------------------------------------------

def _process_tracks(cfg: VIOConfig, s: VIOState):
    """ProcessTracks (src/manager.cpp:171-250) in masked form.

    Returns (state, affected_groups (NG,) bool).
    """
    fr = s.features
    gr = s.groups
    NG = gr.gid.shape[0]
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    active = fr.active
    instate = fr.sind >= 0
    dropped = active & (fr.track == TS_DROPPED)

    # lifetimes
    fr = fr._replace(lifetime=jnp.where(active, fr.lifetime + 1, fr.lifetime))
    gr = gr._replace(lifetime=jnp.where(gr.active, gr.lifetime + 1,
                                        gr.lifetime))
    s = s._replace(features=fr, groups=gr)

    # 1) instate features dropped by the tracker -> free slot, mark group
    inst_drop = dropped & instate
    affected = jnp.any(
        inst_drop[:, None] & (fr.ref[:, None] == jnp.arange(NG)[None, :]),
        axis=0)
    s = _remove_features_from_state(cfg, s, inst_drop)

    # 1b) MSCKF/OOS update: never-instate features leaving the tracker
    # spend their multi-view information before destruction (first-class
    # version of the reference's gated-off use_OOS, src/oos.cpp)
    n_oos_dropped = jnp.zeros((), jnp.int32)
    if cfg.use_OOS:
        from .oos import oos_update
        s, n_oos_dropped = oos_update(cfg, s, dropped & ~instate)

    # 2) all dropped rows leave the table
    s = s._replace(features=_clear_feature_rows(s.features, dropped))
    fr = s.features

    # 3) subfilter update for tracked, non-instate features
    sub = fr.active & (fr.track == TS_TRACKED) & (fr.sind < 0) \
        & ((fr.status == FS_INITIALIZING) | (fr.status == FS_READY))

    grow = jnp.clip(fr.ref, 0, NG - 1)
    Rsbr = _oh_take(gr.Rsb, grow, NG)
    Tsbr = _oh_take(gr.Tsb, grow, NG)

    # 3a) two-view triangulation on the second observation
    if cfg.triangulate_pre_subfilter:
        NF = fr.fid.shape[0]
        # per-row column select from adj_xp as a one-hot contraction
        oh_ref = (grow[:, None]
                  == jnp.arange(NG, dtype=grow.dtype)[None, :])
        first_xp = jnp.einsum("fg,fgk->fk", oh_ref.astype(fr.adj_xp.dtype),
                              fr.adj_xp, precision=HIGHEST)
        n_tri = sub & (fr.init_counter == 0)

        def tri_one(Rr, Tr, xp1, xp2, x):
            xc1 = cam_mod.unproject(kind, s.cam, xp1)
            xc2 = cam_mod.unproject(kind, s.cam, xp2)
            # g12 = (ref cam <- current cam)
            R1 = Rr @ s.X.Rbc
            T1 = Rr @ s.X.Tbc + Tr
            R2 = s.X.Rsb @ s.X.Rbc
            T2 = s.X.Rsb @ s.X.Tbc + s.X.Tsb
            g12R = R1.T @ R2
            g12T = R1.T @ (T2 - T1)
            Xc1, tri_valid = triangulate_two_view_checked(
                g12R, g12T, xc1, xc2, cfg.triangulation.method,
                cfg.triangulation.max_theta_thresh,
                cfg.triangulation.beta_thresh)
            z = Xc1[2]
            ok = (tri_valid & (z > cfg.triangulation.zmin)
                  & (z < cfg.triangulation.zmax))
            zs = jnp.where(ok, z, 1.0)
            xn = jnp.stack([Xc1[0] / zs, Xc1[1] / zs, jnp.log(zs)])
            return jnp.where(ok, xn, x), ok

        x_tri, tri_ok = jax.vmap(tri_one)(Rsbr, Tsbr, first_xp, fr.xp, fr.x)
        fr = fr._replace(
            x=jnp.where((n_tri & tri_ok)[:, None], x_tri, fr.x),
            tri_ok=jnp.where(n_tri, tri_ok, fr.tri_ok))

    x_new, P_new, out_inc, bad = subfilter_update_table(
        kind, s.cam, s.X, Rsbr, Tsbr, fr.x, fr.Psub, fr.xp,
        cfg.subfilter.Rtri, cfg.subfilter.MH_thresh)

    init_c = jnp.where(sub, fr.init_counter + 1, fr.init_counter)
    ready = init_c > cfg.subfilter.ready_steps
    fr = fr._replace(
        x=jnp.where(sub[:, None], x_new, fr.x),
        Psub=jnp.where(sub[:, None, None], P_new, fr.Psub),
        outlier_counter=jnp.where(
            sub, jnp.where(bad, fr.outlier_counter + out_inc, 0.0),
            fr.outlier_counter),
        init_counter=init_c,
        status=jnp.where(sub, jnp.where(ready, FS_READY, FS_INITIALIZING),
                         fr.status))

    # 3b) subfilter outlier eviction
    evict = sub & (fr.outlier_counter > cfg.remove_outlier_counter)
    fr = _clear_feature_rows(fr, evict)
    return s._replace(features=fr), affected, n_oos_dropped


def _add_feature_blocks(cfg: VIOConfig, P, fr: FeatureTable, new_slot_mask,
                        row_of_slot):
    """Insert subfilter covariances into newly-assigned feature slots.

    FillCovarianceBlock parity (src/feature.cpp:753-776): zero the slot's
    rows, then write Psub on the block diagonal. In sqrt form the block
    factor chol(Psub) lands in the slot's own slack-column band, which
    makes it independent of every other state by construction (the band
    is zero everywhere else — see filter/sqrt_form.py).
    """
    d = cfg.dims
    P = zero_state_entries(
        P, _feature_keep_vector(cfg, new_slot_mask, P.dtype) > 0)
    # one-hot gather of each slot's subfilter block (no traced-index gather)
    NF = fr.fid.shape[0]
    oh = ((row_of_slot[:, None] == jnp.arange(NF)[None, :])
          & new_slot_mask[:, None]).astype(P.dtype)        # (S, NF)
    blocks = jnp.einsum("sf,fij->sij", oh, fr.Psub.astype(P.dtype),
                        precision=HIGHEST)
    eye = jnp.eye(d.n_features, dtype=P.dtype)
    fb = d.feature_begin
    if cfg.covariance_form == "sqrt":
        from .sqrt_form import chol3x3, feature_band
        Lb = chol3x3(blocks) * new_slot_mask[:, None, None]
        BD = jnp.einsum("fij,fg->figj", Lb, eye).reshape(
            3 * d.n_features, 3 * d.n_features)
        cb = feature_band(d, 0)
        return P.at[fb:, cb:cb + 3 * d.n_features].add(BD)
    BD = jnp.einsum("fij,fg->figj", blocks, eye).reshape(
        3 * d.n_features, 3 * d.n_features)
    return P.at[fb:, fb:].add(BD)


def _refine_candidate_depths(cfg: VIOConfig, s: VIOState) -> VIOState:
    """use_depth_opt: GN-refine candidate depths before admission; destroy
    candidates that fail (src/manager.cpp:386-404)."""
    from .refine import refine_depth

    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    cand = _candidate_mask(cfg, s)
    grow = jnp.clip(fr.ref, 0, NG - 1)
    ref_oh = jax.nn.one_hot(grow, NG, dtype=bool)
    obs_mask = fr.adj & ~ref_oh & gr.active[None, :]
    multi = jnp.sum(obs_mask, axis=1) >= 1
    do = cand & multi

    def one(Rsbr, Tsbr, om, oxp, x0, P0):
        return refine_depth(kind, s.cam, s.X, Rsbr, Tsbr, gr.Rsb, gr.Tsb,
                            om, oxp, x0, P0, cfg.refinement)

    xn, Pn, ok = jax.vmap(one)(_oh_take(gr.Rsb, grow, NG),
                               _oh_take(gr.Tsb, grow, NG), obs_mask,
                               fr.adj_xp, fr.x, fr.Psub)

    good = do & ok
    bad = do & ~ok
    fr = fr._replace(
        x=jnp.where(good[:, None], xn, fr.x),
        Psub=jnp.where(good[:, None, None], Pn, fr.Psub))
    fr = _clear_feature_rows(fr, bad)
    return s._replace(features=fr)


def _candidate_mask(cfg: VIOConfig, s: VIOState):
    fr = s.features
    strict = s.vision_counter >= cfg.strict_criteria_timesteps
    status_ok = jnp.where(strict, fr.status == FS_READY,
                          (fr.status == FS_READY)
                          | (fr.status == FS_INITIALIZING))
    z = jnp.exp(fr.x[:, 2])
    ok = (fr.active & (fr.sind < 0) & (fr.track == TS_TRACKED) & status_ok
          & (fr.outlier_counter < 0.01)
          & (z > cfg.min_z) & (z < cfg.max_z))
    if cfg.max_depth_var_for_admission != float("inf"):
        ok = ok & (fr.Psub[:, 2, 2] < cfg.max_depth_var_for_admission)
    return ok


def _admission_score(cfg: VIOConfig, fr: FeatureTable):
    """Smaller = better: READY status first, then the configured
    uncertainty score — full Criteria::CandidateComparison parity
    (src/options.cpp:35-61 + comparison_score_type knob):

    * DepthUncertainty              — subfilter depth variance P(2,2)
    * CovarianceDiagNorm            — ||diag(Psub)||
    * CovarianceDiagNormPlusOutlierCount — + the subfilter outlier
      counter (the Corvis-implemented variant per the reference)
    """
    st = cfg.comparison_score_type
    if st == "DepthUncertainty":
        u = fr.Psub[:, 2, 2]
    elif st == "CovarianceDiagNorm":
        u = jnp.linalg.norm(
            jnp.diagonal(fr.Psub, axis1=-2, axis2=-1), axis=-1)
    else:  # CovarianceDiagNormPlusOutlierCount (validated in config)
        u = jnp.linalg.norm(
            jnp.diagonal(fr.Psub, axis1=-2, axis2=-1), axis=-1) \
            + fr.outlier_counter
    return jnp.where(fr.status == FS_READY, 0.0, 1e6) + u


def _admit_groups(cfg: VIOConfig, s: VIOState) -> VIOState:
    """AddGroupOfFeatures (src/manager.cpp:469-566), single pass.

    The reference loops group-by-group; here all admissions of the frame
    happen at once: groups ranked by candidate count, admitted while
    group slots and the cumulative feature budget allow, and their
    covariance initialization — a copy of the current (Wsb, Tsb) rows —
    is ONE gather P[idx][:, idx] for every admitted slot simultaneously.
    """
    d = cfg.dims
    NG = d.ng_rows
    NF = d.nf_rows
    G = d.n_groups
    fr, gr = s.features, s.groups

    cand = _candidate_mask(cfg, s) & (fr.status == FS_READY)
    ref_oh = (fr.ref[:, None] == jnp.arange(NG)[None, :]) & cand[:, None]
    n_cand = jnp.sum(ref_oh, axis=0)
    free_fslots = jnp.sum((s.f2row < 0).astype(jnp.int32))
    free_gslots = jnp.sum((s.g2row < 0).astype(jnp.int32))
    # a group is admissible if it needs a slot (sind < 0) OR it is a
    # pure pose clone "graduating" to a feature-anchor group: clones
    # already hold a slot + covariance, so admission only commits their
    # feature cohort and clears the clone class. Static gate: without
    # cloning no is_clone bit is ever set.
    cloning = cfg.use_OOS or cfg.clone_frame_groups
    grad = (gr.sind >= 0) & gr.is_clone if cloning \
        else jnp.zeros((NG,), bool)
    need_slot = gr.active & (gr.sind < 0)
    eligible = gr.active & (need_slot | grad) \
        & (n_cand >= cfg.num_gauge_xy_features)

    # rank eligible groups by candidate count (desc); admit while the
    # cumulative feature demand fits the free feature slots and group
    # slots remain (the loop-termination conditions of the reference).
    # Sort/scatter-free: pairwise-comparison rank + masked reduction for
    # the cumulative demand of higher-priority groups.
    key = jnp.where(eligible, -n_cand, 1)
    rank, before = _rank_by_key(jnp.ones((NG,), bool), key.astype(jnp.int32))
    demand = jnp.where(eligible, n_cand, 0)
    cum_before = jnp.sum(before * demand[None, :], axis=1, dtype=jnp.int32)
    # only slot-needing groups consume the free-slot budget; graduating
    # clones pass the slot check unconditionally
    slot_before = jnp.sum(before & (eligible & need_slot)[None, :], axis=1,
                          dtype=jnp.int32)
    slot_ok = jnp.where(need_slot, slot_before < free_gslots, True)
    take = eligible & slot_ok \
        & (rank < cfg.max_group_admissions) \
        & (cum_before < jnp.maximum(
            free_fslots - max(cfg.num_gauge_xy_features, 1) + 1, 0))

    def admit(s: VIOState) -> VIOState:
        fr, gr = s.features, s.groups
        # assign group slots to taken slot-needing rows (graduating
        # clones keep the slot they already own)
        gslot_of_row, got_g = _rank_assign(
            s.g2row < 0, take & need_slot, -n_cand.astype(s.P.dtype))
        tgt = jnp.where(got_g, gslot_of_row, G)
        gr = gr._replace(
            sind=jnp.where(got_g, gslot_of_row.astype(jnp.int32), gr.sind),
            is_clone=gr.is_clone & ~take)
        g2row, new_slot, _ = _place_one_hot(tgt, G, s.g2row)
        # covariance init for ALL new slots at once: every entry of an
        # admitted slot's block reads from the (Wsb, Tsb) rows. The source
        # indices are STATIC (only the which-slot mask is traced), so this
        # is static slicing + select rather than a traced-index gather.
        gb, ge = L.GROUP_BEGIN, L.GROUP_BEGIN + 6 * G
        sel = jnp.repeat(new_slot, 6)                              # (6G,)
        P = s.P
        src_rows = jnp.tile(jnp.concatenate(
            [P[L.WSB:L.WSB + 3], P[L.TSB:L.TSB + 3]], axis=0), (G, 1))
        grows = jnp.where(sel[:, None], src_rows, P[gb:ge])
        P = jnp.concatenate([P[:gb], grows, P[ge:]], axis=0)
        if cfg.covariance_form != "sqrt":
            # dense form needs the symmetric column copy too; on a factor
            # the row copy alone realizes the error-clone exactly
            src_cols = jnp.tile(jnp.concatenate(
                [P[:, L.WSB:L.WSB + 3], P[:, L.TSB:L.TSB + 3]], axis=1),
                (1, G))
            gcols = jnp.where(sel[None, :], src_cols, P[:, gb:ge])
            P = jnp.concatenate([P[:, :gb], gcols, P[:, ge:]], axis=1)
        s = s._replace(groups=gr, g2row=g2row, P=P)
        # admit candidate features of all taken groups in one pass
        want = cand & _oh_take(take, jnp.clip(fr.ref, 0, NG - 1),
                               NG) & (fr.ref >= 0)
        slot_of_row, got = _rank_assign(
            s.f2row < 0, want, _admission_score(cfg, fr))
        return _commit_feature_admissions(cfg, s, slot_of_row, got)

    F = d.n_features
    return jax.lax.cond(
        jnp.any(take), admit,
        lambda s: (s, jnp.zeros((F,), bool),
                   jnp.full((F,), -1, jnp.int32)), s)


def _commit_feature_admissions(cfg: VIOConfig, s: VIOState, slot_of_row,
                               got):
    """Apply a feature-slot assignment: table, f2row, covariance blocks.

    Returns (state, new_slot_mask, row_of_slot). The correlated-init
    congruence (approximate_init_covariance) is NOT applied here: the
    two admission passes of a frame (_admit_groups +
    _admit_features_within_groups) each ran it, and under batch vmap
    the admission cond is a select, so the F x G jacobian sweep — the
    dominant consistency-config cost (ARCHITECTURE round-5) — executed
    TWICE every frame. The pipeline now applies it ONCE on the union
    of both cohorts (_apply_init_correlations); J's inputs (feature
    subfilter states, group poses, adjacency) are untouched by the
    admissions themselves, so the union application is exact."""
    d = cfg.dims
    fr = s.features
    NF = fr.fid.shape[0]
    tgt_slot = jnp.where(got, slot_of_row, d.n_features)
    f2row, new_slot_mask, row_of_slot = _place_one_hot(
        tgt_slot, d.n_features, s.f2row)
    fr = fr._replace(
        sind=jnp.where(got, slot_of_row.astype(jnp.int32), fr.sind),
        status=jnp.where(got, FS_INSTATE, fr.status),
        # FEJ linearization point frozen at EKF admission
        x_fej=jnp.where(got[:, None], fr.x, fr.x_fej))
    P = _add_feature_blocks(cfg, s.P, fr, new_slot_mask, row_of_slot)
    s = s._replace(features=fr, f2row=f2row, P=P)
    return s, new_slot_mask, row_of_slot


def _apply_init_correlations(cfg: VIOConfig, s: VIOState, new_slot_mask,
                             row_of_slot) -> VIOState:
    """One correlated-init congruence for all slots admitted this
    frame (see _commit_feature_admissions)."""
    if not cfg.approximate_init_covariance:
        return s
    from .init_cov import add_init_correlations
    return jax.lax.cond(
        jnp.any(new_slot_mask),
        lambda s: add_init_correlations(cfg, s, new_slot_mask,
                                        row_of_slot),
        lambda s: s, s)


def _admit_features_within_groups(cfg: VIOConfig, s: VIOState) -> VIOState:
    """AddFeaturesWithInGroups (src/manager.cpp:358-405).

    Pure pose clones are NOT admission anchors: features may only
    trickle into groups that entered (or graduated) through the gated
    _admit_groups path, keeping admission cadence identical to the
    non-cloning filter (see GroupTable.is_clone)."""
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    cand = _candidate_mask(cfg, s)
    anchor_ok = (gr.sind >= 0) & ~gr.is_clone
    ref_instate = _oh_take(anchor_ok, jnp.clip(fr.ref, 0, NG - 1), NG)
    want = cand & ref_instate & (fr.ref >= 0)
    slot_of_row, got = _rank_assign(s.f2row < 0, want,
                                    _admission_score(cfg, fr))
    return _commit_feature_admissions(cfg, s, slot_of_row, got)


def _discard_affected_groups(cfg: VIOConfig, s: VIOState, affected):
    """DiscardAffectedGroups + ownership transfer (src/manager.cpp:310-328,
    src/graph.cpp:174-232). The body runs under a runtime cond — most
    frames have no affected groups."""
    def run(s):
        return _discard_affected_groups_impl(cfg, s, affected)

    def skip(s):
        return s, jnp.asarray(False)

    return jax.lax.cond(jnp.any(affected), run, skip, s)


def _discard_affected_groups_impl(cfg: VIOConfig, s: VIOState, affected):
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    NF = fr.fid.shape[0]

    inst_feat = fr.sind >= 0
    n_instate_of = jnp.sum(
        (fr.ref[:, None] == jnp.arange(NG)[None, :]) & inst_feat[:, None],
        axis=0)
    if cfg.num_gauge_xy_features > 0:
        discard = affected & gr.active \
            & (n_instate_of < cfg.num_gauge_xy_features)
    else:
        discard = affected & gr.active & (n_instate_of == 0)

    # ownership transfer for features whose ref is discarded
    grow_old = jnp.clip(fr.ref, 0, NG - 1)
    needs = fr.active & _oh_take(discard, grow_old, NG) & (fr.ref >= 0)
    ginstate_ok = gr.instate & ~discard
    # candidate new owners: groups the feature observed, instate, surviving
    owner_ok = fr.adj & ginstate_ok[None, :]
    has_owner = jnp.any(owner_ok, axis=1)
    new_ref = jnp.argmax(owner_ok, axis=1).astype(jnp.int32)

    grow_new = jnp.clip(new_ref, 0, NG - 1)
    xn, Pn, okz = jax.vmap(change_owner,
                           in_axes=(None, 0, 0, 0, 0, 0, 0))(
        s.X, _oh_take(gr.Rsb, grow_old, NG), _oh_take(gr.Tsb, grow_old, NG),
        _oh_take(gr.Rsb, grow_new, NG), _oh_take(gr.Tsb, grow_new, NG),
        fr.x, fr.Psub)

    transfer = needs & has_owner & okz
    failed = needs & ~transfer
    fr = fr._replace(
        x=jnp.where(transfer[:, None], xn, fr.x),
        Psub=jnp.where(transfer[:, None, None],
                       Pn * cfg.feature_owner_change_cov_factor, fr.Psub),
        ref=jnp.where(transfer, new_ref, fr.ref),
        # reparametrization resets the FEJ point (standard practice on
        # relinearization)
        x_fej=jnp.where(transfer[:, None], xn, fr.x_fej))
    s = s._replace(features=fr)

    # failed transfers: NULLREFED -> removed from state and destroyed
    s = _remove_features_from_state(cfg, s, failed)
    s = s._replace(features=_clear_feature_rows(s.features, failed))

    # the groups themselves: out of state + out of the graph
    s = _remove_groups_from_state(cfg, s, discard)
    gr = s.groups
    gr = gr._replace(gid=jnp.where(discard, -1, gr.gid),
                     lifetime=jnp.where(discard, 0, gr.lifetime))
    fr = s.features._replace(adj=s.features.adj & ~discard[None, :])
    changed = jnp.any(discard) | jnp.any(transfer) | jnp.any(failed)
    return s._replace(groups=gr, features=fr), changed


def _one_pt_ransac(cfg: VIOConfig, s: VIOState, inlier_slots):
    """Low-innovation partial update + chi-square rescue of the rest.

    Port of Estimator::OnePointRANSAC (src/update.cpp:213-393). Note the
    reference's hypothesis loop never applies the sampled hypothesis to
    the state (the per-iteration inlier set is identical), so the
    effective algorithm — reproduced here — is: (1) split MH inliers
    into low-/high-innovation sets against the current prediction;
    (2) EKF-update a COPY of the state with low-innovation rows only
    (unobservable rows zeroed); (3) re-evaluate the high-innovation
    features against the updated state and rescue those passing the
    chi-square gate; (4) discard the rest, keep the original state.

    Returns (state, final_inlier_slots) — rejected features destroyed.
    """
    d = cfg.dims
    sj = build_stacked_jacobian(cfg, s)
    inn2 = sj.inn.reshape(-1, 2)
    res_norm = jnp.linalg.norm(inn2, axis=1)
    li = inlier_slots & sj.valid & (res_norm < cfg.ransac_thresh)
    hi = inlier_slots & sj.valid & ~li

    def with_ransac(s_and_masks):
        s, li, hi = s_and_masks
        fr, gr = s.features, s.groups
        NGR = gr.gid.shape[0]
        # groups owning at least one low-innovation inlier (one-hot)
        li_rows = jnp.any(
            li[:, None] & (s.f2row[:, None]
                           == jnp.arange(d.nf_rows)[None, :]), axis=0)
        g_with_li = jnp.any(
            (li_rows & (fr.ref >= 0))[:, None]
            & (fr.ref[:, None] == jnp.arange(NGR)[None, :]), axis=0)

        # unobservable-direction guard: zero covariance of non-li feature
        # slots and of instate groups with no li feature (plus a temporary
        # reference group if the gauge group has none)
        keepf = _feature_keep_vector(
            cfg, (s.f2row >= 0) & ~li, s.P.dtype)
        gslot_zero = jnp.zeros((d.n_groups,), bool)
        grow_of_slot = jnp.clip(s.g2row, 0, NGR - 1)
        g_noli = (s.g2row >= 0) & ~_oh_take(g_with_li, grow_of_slot, NGR)
        keepg = _group_keep_vector(cfg, g_noli, s.P.dtype)
        P_li = zero_state_entries(s.P, (keepf * keepg) > 0)

        diagR = jnp.full((2 * d.n_features,), cfg.R, s.P.dtype)
        err, P_upd = measurement_update(P_li, sj.H, sj.inn, diagR, li)
        s_upd = absorb_error(cfg, s._replace(P=P_upd), err)

        # re-evaluate high-innovation features on the updated state
        sj2 = build_stacked_jacobian(cfg, s_upd)
        dist2 = mh_distances(s_upd.P, sj2.H, sj2.inn, cfg.R)
        rescued = hi & (dist2 < cfg.ransac_Chi2)
        return rescued

    any_hi = jnp.any(hi)
    all_li = ~any_hi
    rescued = jax.lax.cond(any_hi, with_ransac,
                           lambda sm: jnp.zeros_like(hi), (s, li, hi))
    final = jnp.where(all_li, inlier_slots, li | rescued)
    rejected = inlier_slots & sj.valid & ~final
    return s, final, rejected


def _refresh_gauge_features(cfg: VIOConfig, s: VIOState) -> VIOState:
    """Keep every instate group at num_gauge_xy gauge features.

    Invariant form of FindNewGaugeFeatures (src/graph.cpp:271-360): any
    instate group with fewer than num_gauge_xy gauge features promotes its
    lowest-uncertainty instate features and freezes their XY covariance
    (FixFeatureXY, src/estimator.cpp:1474-1478).
    """
    if cfg.num_gauge_xy_features == 0:
        return s
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    NF = fr.fid.shape[0]
    is_gauge = fr.active & (fr.status == FS_GAUGE) & (fr.sind >= 0)
    ref_oh = fr.ref[:, None] == jnp.arange(NG)[None, :]
    n_gauge = jnp.sum(ref_oh & is_gauge[:, None], axis=0)
    # pure pose clones anchor no features by construction — excluding
    # them keeps the rare-branch cond from firing every frame in
    # cloning configs (their deficit would always read num_gauge_xy)
    deficit = jnp.where(gr.instate & ~gr.is_clone,
                        cfg.num_gauge_xy_features - n_gauge, 0)

    def run(s):
        fr = s.features
        cand = fr.active & (fr.status == FS_INSTATE) & (fr.sind >= 0) \
            & (fr.ref >= 0)
        # rank candidates within their ref group by row order
        lower = jnp.tril(jnp.ones((NF, NF), bool), k=-1)
        same = fr.ref[:, None] == fr.ref[None, :]
        rank = jnp.sum(lower & same & cand[None, :] & cand[:, None],
                       axis=1)
        promote = cand & (rank < _oh_take(deficit,
                                          jnp.clip(fr.ref, 0, NG - 1), NG))

        fr = fr._replace(status=jnp.where(promote, FS_GAUGE, fr.status))
        # freeze XY covariance of promoted slots (one-hot slot mask)
        hitslot = jnp.any(
            promote[:, None] & (fr.sind[:, None]
                                == jnp.arange(cfg.dims.n_features)[None, :]),
            axis=0)
        xy = jnp.array([True, True, False])
        slot_mask2 = hitslot[:, None] & xy[None, :]
        keep = jnp.ones((cfg.dims.full,), s.P.dtype)
        keep = keep.at[cfg.dims.feature_begin:].set(
            jnp.where(slot_mask2.reshape(-1), 0.0, 1.0))
        P = zero_state_entries(s.P, keep > 0)
        return s._replace(features=fr, P=P)

    # most frames have no gauge deficit — cond keeps them cheap
    need = jnp.any((deficit > 0) & gr.instate)
    return jax.lax.cond(need, run, lambda s: s, s)


def _switch_gauge_group(cfg: VIOConfig, s: VIOState) -> VIOState:
    """SwitchRefGroup (src/estimator.cpp:1362-1391): when the gauge group
    is lost, pick the instate group with the smallest pose covariance and
    freeze 4 or 6 of its dof."""
    gr = s.groups
    NG = gr.gid.shape[0]

    def pick(s):
        gr = s.groups
        G = cfg.dims.n_groups
        if cfg.covariance_form == "sqrt":
            from .sqrt_form import factor_diag
            diag = factor_diag(s.P)
        else:
            diag = jnp.diagonal(s.P)
        # per-SLOT pose-covariance traces, densely; then per-row via a
        # tiny one-hot matvec. (A vmapped dynamic_slice over the 128
        # group rows serializes on TPU — and under batch vmap this
        # "rare" cond branch runs every frame as a select.)
        tr6 = diag[L.GROUP_BEGIN:L.GROUP_BEGIN + 6 * G].reshape(G, 6).sum(1)
        sl = jnp.clip(gr.sind, 0, G - 1)
        tr = (sl[:, None] == jnp.arange(G)[None, :]).astype(diag.dtype) @ tr6
        tr = jnp.where(gr.instate, tr, jnp.inf)
        row = jnp.argmax(tr == tr.min()).astype(jnp.int32)
        gslot = gr.sind[row]
        off = L.GROUP_BEGIN + 6 * gslot
        start = jnp.where(cfg.group_degrees_fixed == 4, off + 2, off)
        n_fix = cfg.group_degrees_fixed
        entry = jnp.arange(cfg.dims.full)
        keep = jnp.where((entry >= start) & (entry < start + n_fix),
                         jnp.zeros((), s.P.dtype),
                         jnp.ones((), s.P.dtype))
        P = zero_state_entries(s.P, keep > 0)
        return s._replace(P=P, gauge_row=row)

    has_instate = jnp.any(gr.instate)
    return jax.lax.cond((s.gauge_row < 0) & has_instate, pick,
                        lambda s: s, s)


def _enforce_max_group_lifetime(cfg: VIOConfig, s: VIOState) -> VIOState:
    """EnforceMaxGroupLifetime (src/manager.cpp:282-306)."""
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    is_ref = jnp.any(
        (fr.active & (fr.ref >= 0))[:, None]
        & (fr.ref[:, None] == jnp.arange(NG)[None, :]), axis=0)
    old = gr.active & (gr.lifetime > cfg.max_group_lifetime) & ~is_ref \
        & ~gr.instate
    gr = gr._replace(gid=jnp.where(old, -1, gr.gid),
                     lifetime=jnp.where(old, 0, gr.lifetime))
    fr = fr._replace(adj=fr.adj & ~old[None, :])
    return s._replace(features=fr, groups=gr)


def _create_group_and_init_tracks(cfg: VIOConfig, s: VIOState) -> VIOState:
    """End-of-frame group creation + new-track initialization.

    Parity: Group::Create + InitializeJustCreatedTracks +
    AssociateTrackedFeaturesWithGroup (src/manager.cpp:119-128, 570-627).
    """
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    dtype = s.P.dtype

    # Allocate a group row. Policy (graceful version of the reference's
    # MemoryManager exhaustion fatal, src/mm.cpp:92-98):
    #   1. a free row, else
    #   2. the oldest non-instate row nobody references, else
    #   3. force-evict the oldest non-instate row that IS a reference —
    #      and drop every feature anchored to it (they lose their anchor).
    # Never an instate row: those carry EKF state.
    free = ~gr.active
    is_ref = jnp.any(
        (fr.active & (fr.ref >= 0))[:, None]
        & (fr.ref[:, None] == jnp.arange(NG)[None, :]), axis=0)
    evictable = gr.active & ~gr.instate & ~is_ref
    forceable = gr.active & ~gr.instate
    pick_free = jnp.any(free)
    pick_evict = jnp.any(evictable)
    row = jnp.where(
        pick_free, jnp.argmax(free),
        jnp.where(pick_evict,
                  jnp.argmax(jnp.where(evictable, gr.lifetime, -1)),
                  jnp.argmax(jnp.where(forceable, gr.lifetime, -1)))
    ).astype(jnp.int32)

    # case 3: orphan + drop features anchored to the victim row
    forced = ~pick_free & ~pick_evict
    orphans = fr.active & (fr.ref == row) & forced
    s = _remove_features_from_state(cfg, s._replace(features=fr, groups=gr),
                                    orphans)
    fr = _clear_feature_rows(s.features, orphans)
    gr = s.groups

    gr = gr._replace(
        gid=gr.gid.at[row].set(s.next_gid),
        Rsb=gr.Rsb.at[row].set(s.X.Rsb),
        Tsb=gr.Tsb.at[row].set(s.X.Tsb),
        lifetime=gr.lifetime.at[row].set(0),
        sind=gr.sind.at[row].set(-1),
        is_clone=gr.is_clone.at[row].set(False),
        # FEJ linearization point = pose at creation (never retracted)
        Rsb_fej=gr.Rsb_fej.at[row].set(s.X.Rsb),
        Tsb_fej=gr.Tsb_fej.at[row].set(s.X.Tsb),
    )
    # stale adjacency to the overwritten row must vanish; a reused gauge
    # row no longer identifies the gauge group
    fr = fr._replace(adj=fr.adj.at[:, row].set(False))
    s = s._replace(gauge_row=jnp.where(row == s.gauge_row, -1, s.gauge_row))

    # new tracks: ref = new group, initialize local state
    newf = fr.active & (fr.track == TS_CREATED)
    xc = jax.vmap(lambda xp: cam_mod.unproject(kind, s.cam, xp))(fr.xp)
    fx = s.cam[0]
    use_sim = cfg.sim_initialize_depths & (fr.sim_depth > 0)
    z0 = jnp.where(use_sim, fr.sim_depth, s.init_z)
    x_init = jnp.concatenate([xc, jnp.log(z0)[:, None]], axis=1)

    if cfg.triangulate_pre_subfilter:
        # tri happens later (second obs); bad-tri stds apply to all inits
        stds = jnp.stack([
            jnp.full((fr.fid.shape[0],), cfg.init_std_x_badtri, dtype) / fx,
            jnp.full((fr.fid.shape[0],), cfg.init_std_y_badtri, dtype) / fx,
            jnp.full((fr.fid.shape[0],), cfg.init_std_z_badtri, dtype)],
            axis=1)
    else:
        stds = jnp.stack([
            jnp.full((fr.fid.shape[0],), cfg.init_std_x, dtype) / fx,
            jnp.full((fr.fid.shape[0],), cfg.init_std_y, dtype) / fx,
            jnp.full((fr.fid.shape[0],), cfg.init_std_z, dtype)], axis=1)
    P_init = jax.vmap(jnp.diag)(stds ** 2)

    fr = fr._replace(
        ref=jnp.where(newf, row, fr.ref),
        x=jnp.where(newf[:, None], x_init.astype(dtype), fr.x),
        Psub=jnp.where(newf[:, None, None], P_init, fr.Psub),
        status=jnp.where(newf, FS_INITIALIZING, fr.status))

    # adjacency: every live track (tracked or just created) observes the
    # new group at its current pixel
    obs = fr.active & ((fr.track == TS_TRACKED) | newf)
    fr = fr._replace(
        adj=fr.adj.at[:, row].set(obs),
        adj_xp=fr.adj_xp.at[:, row, :].set(fr.xp))

    s = s._replace(features=fr, groups=gr, next_gid=s.next_gid + 1)
    if cfg.use_OOS or cfg.clone_frame_groups:
        s = _clone_group_into_state(cfg, s, row)
    return s


def _clone_group_into_state(cfg: VIOConfig, s: VIOState, row) -> VIOState:
    """MSCKF-style pose cloning: the fresh frame group joins the EKF
    window even WITHOUT admitted features.

    Without this, groups only become instate through feature admission,
    the window holds 1-2 anchor groups, and no feature ever accumulates
    OOS_min_observations instate observations — the OOS update would be
    a permanent no-op (which is effectively the reference's shipped
    behavior: use_OOS hard-faults, src/estimator.cpp:120-122). With
    cloning, never-instate features see a sliding window of recent
    poses — the classic MSCKF state layout. When the window is full the
    OLDEST instate group anchoring no instate feature (a pure clone) is
    marginalized.
    """
    gr, fr = s.groups, s.features
    G = cfg.dims.n_groups
    NG = gr.gid.shape[0]

    # evict the oldest featureless instate group if no slot is free
    grow_of_slot = jnp.clip(s.g2row, 0, NG - 1)
    inst_f = fr.sind >= 0
    anchors = jnp.any(
        inst_f[:, None] & (fr.ref[:, None] == jnp.arange(NG)[None, :]),
        axis=0)                                            # (NG,)
    occupied = s.g2row >= 0
    slot_anchor = _oh_take(anchors, grow_of_slot, NG) & occupied
    slot_gid = _oh_take(gr.gid, grow_of_slot, NG)
    evictable = occupied & ~slot_anchor
    big = jnp.iinfo(jnp.int32).max
    evict_slot = jnp.argmin(jnp.where(evictable, slot_gid, big))
    need_evict = ~jnp.any(~occupied) & jnp.any(evictable)
    evict_rows = (jnp.arange(NG)
                  == jnp.where(need_evict,
                               grow_of_slot[evict_slot], NG))
    s = jax.lax.cond(need_evict,
                     lambda s: _remove_groups_from_state(cfg, s,
                                                         evict_rows),
                     lambda s: s, s)

    # assign a free slot (if any) and clone the body-pose covariance
    free = s.g2row < 0
    can = jnp.any(free)
    slot = jnp.argmax(free).astype(jnp.int32)
    gr = s.groups
    gr = gr._replace(
        sind=gr.sind.at[jnp.where(can, row, NG)].set(slot),
        is_clone=gr.is_clone.at[jnp.where(can, row, NG)].set(True))
    g2row = s.g2row.at[jnp.where(can, slot, G)].set(row)
    new_slot_mask = (jnp.arange(G) == slot) & can
    # covariance init = copy of the current (Wsb, Tsb) error rows
    # (AddGroupToState, src/estimator.cpp:786-824); factor form needs
    # rows only
    gb, ge = L.GROUP_BEGIN, L.GROUP_BEGIN + 6 * G
    sel = jnp.repeat(new_slot_mask, 6)
    P = s.P
    src_rows = jnp.tile(jnp.concatenate(
        [P[L.WSB:L.WSB + 3], P[L.TSB:L.TSB + 3]], axis=0), (G, 1))
    grows = jnp.where(sel[:, None], src_rows, P[gb:ge])
    P = jnp.concatenate([P[:gb], grows, P[ge:]], axis=0)
    if cfg.covariance_form != "sqrt":
        src_cols = jnp.tile(jnp.concatenate(
            [P[:, L.WSB:L.WSB + 3], P[:, L.TSB:L.TSB + 3]], axis=1),
            (1, G))
        gcols = jnp.where(sel[None, :], src_cols, P[:, gb:ge])
        P = jnp.concatenate([P[:, :gb], gcols, P[:, ge:]], axis=1)
    return s._replace(groups=gr, g2row=g2row, P=P)


def _adapt_initial_depth(cfg: VIOConfig, s: VIOState) -> VIOState:
    """AdaptInitialDepth (src/manager.cpp:255-278): EMA of median depth."""
    fr = s.features
    use = fr.active & ((fr.sind >= 0)
                       | ((fr.status == FS_READY)
                          & (fr.lifetime > cfg.adaptive_depth_min_lifetime)))
    z = jnp.exp(fr.x[:, 2])
    n = jnp.sum(use.astype(jnp.int32))
    zs = jnp.sort(jnp.where(use, z, jnp.inf))
    med = zs[jnp.clip(n // 2, 0, z.shape[0] - 1)]
    ok = (n > 0) & (med > cfg.min_z) & (med < cfg.max_z)
    beta = cfg.adaptive_depth_beta
    new_z = jnp.where(ok, (1.0 - beta) * s.init_z + beta * med, s.init_z)
    return s._replace(init_z=new_z.astype(s.init_z.dtype))


# ---------------------------------------------------------------------------
# the frame step
# ---------------------------------------------------------------------------

class StepOutputs(NamedTuple):
    Rsb: jnp.ndarray
    Tsb: jnp.ndarray
    Vsb: jnp.ndarray
    num_instate_features: jnp.ndarray
    num_instate_groups: jnp.ndarray
    num_tracked: jnp.ndarray
    num_mh_rejected: jnp.ndarray
    # 1-pt RANSAC rejects, split from the MH count (the reference binds
    # them separately: num_oneptransac_rejected, pyxivo.cpp:332-398)
    num_oneptransac_rejected: jnp.ndarray
    # homography-RANSAC tracker rejects (Tracker counters,
    # src/tracker.h:47-51)
    num_tracker_outlier_rejected: jnp.ndarray
    inn_rms: jnp.ndarray
    # OOS candidates beyond cfg.oos_feature_cap this frame (0 when
    # use_OOS is off) — the no-silent-caps diagnostic
    num_oos_dropped: jnp.ndarray


def update_step(cfg: VIOConfig, s: VIOState) -> Tuple[VIOState, StepOutputs]:
    """The full per-frame filter pipeline after tracker association.

    Mirrors Estimator::UpdateStep (src/manager.cpp:18-167). The whole
    step is traced under float32 matmul precision: the covariance
    algebra does not survive the TPU's default bfloat16 passes, and the
    library owns that requirement (entrypoints must not need a global
    jax_default_matmul_precision flag). Explicit per-op precisions
    still win where set.
    """
    with jax.default_matmul_precision("float32"):
        s, out = _update_step_impl(cfg, s)
    # sqrt form: no end-of-frame work — the ONE per-frame factor
    # re-compression lives at the START of frame propagation, where it
    # also absorbs the process noise (sqrt_form.factor_propagate_absorb)
    return s, out


def _update_step_impl(cfg: VIOConfig, s: VIOState
                      ) -> Tuple[VIOState, StepOutputs]:
    s, affected, n_oos_dropped = _process_tracks(cfg, s)

    # admission
    if cfg.use_depth_opt:
        s = _refine_candidate_depths(cfg, s)
    if cfg.num_gauge_xy_features > 0:
        s, nsm_g, ros_g = _admit_groups(cfg, s)
    else:
        F = cfg.dims.n_features
        nsm_g = jnp.zeros((F,), bool)
        ros_g = jnp.full((F,), -1, jnp.int32)
    s, nsm_w, ros_w = _admit_features_within_groups(cfg, s)
    # ONE correlated-init pass over the union of both admission cohorts
    s = _apply_init_correlations(
        cfg, s, nsm_g | nsm_w, jnp.where(nsm_g, ros_g, ros_w))

    # jacobians + MH gating
    sj = build_stacked_jacobian(cfg, s)
    dist = mh_distances(s.P, sj.H, sj.inn, cfg.R)
    n_inst = jnp.sum(sj.valid.astype(jnp.int32))

    if cfg.use_MH_gating:
        inlier_slots = jnp.where(n_inst > cfg.min_inliers,
                                 mh_gate(cfg, dist, sj.valid), sj.valid)
    else:
        inlier_slots = sj.valid
    rejected_slots = sj.valid & ~inlier_slots
    num_rej = jnp.sum(rejected_slots.astype(jnp.int32))

    # rejected features: destroy + mark their groups affected (one-hot)
    rej_rows_idx = jnp.where(rejected_slots, s.f2row, -1)
    rej_rows = jnp.any(
        (rej_rows_idx >= 0)[:, None]
        & (rej_rows_idx[:, None] == jnp.arange(cfg.dims.nf_rows)[None, :]),
        axis=0)
    NG = cfg.dims.ng_rows
    affected = affected | jnp.any(
        (rej_rows & (s.features.ref >= 0))[:, None]
        & (s.features.ref[:, None] == jnp.arange(NG)[None, :]), axis=0)
    s = _remove_features_from_state(cfg, s, rej_rows)
    s = s._replace(features=_clear_feature_rows(s.features, rej_rows))

    # group hygiene + gauge maintenance
    s, structure_changed = _discard_affected_groups(cfg, s, affected)
    s = _refresh_gauge_features(cfg, s)

    num_1pt = jnp.zeros((), jnp.int32)
    if cfg.use_1pt_RANSAC:
        s, inlier_slots, ransac_rej = _one_pt_ransac(cfg, s, inlier_slots)
        rej_rows_idx = jnp.where(ransac_rej, s.f2row, -1)
        rej_rows = jnp.any(
            (rej_rows_idx >= 0)[:, None]
            & (rej_rows_idx[:, None]
               == jnp.arange(cfg.dims.nf_rows)[None, :]), axis=0)
        affected2 = jnp.any(
            (rej_rows & (s.features.ref >= 0))[:, None]
            & (s.features.ref[:, None] == jnp.arange(NG)[None, :]), axis=0)
        num_1pt = jnp.sum(ransac_rej.astype(jnp.int32))
        s = _remove_features_from_state(cfg, s, rej_rows)
        s = s._replace(features=_clear_feature_rows(s.features, rej_rows))
        s, ch2 = _discard_affected_groups(cfg, s, affected2)
        structure_changed = structure_changed | ch2
        s = _refresh_gauge_features(cfg, s)

    # the EKF update with surviving inliers. Ownership transfers (rare)
    # reparametrize features, invalidating the gating-time Jacobians.
    # The reference reuses the stale Jacobians anyway (UpdateStep order:
    # ComputeInstateJacobians -> OutlierRejection -> DiscardAffectedGroups
    # -> FilterUpdate, src/manager.cpp:18-167; SURVEY §7.3). Default here
    # is recompute_stale_jacobians=True: the parity behavior measurably
    # degrades online camera-intrinsics convergence (see config.py), and
    # with the gather-free jacobian build the rebuild is cheap even
    # though under batch vmap the cond runs every frame as a select.
    if cfg.recompute_stale_jacobians:
        sj2 = jax.lax.cond(structure_changed,
                           lambda s: build_stacked_jacobian(cfg, s),
                           lambda s: sj, s)
    else:
        # stale reuse, but features REMOVED from the state since gating
        # must not contribute rows (their P slots were zeroed; the valid
        # mask keeps the Joseph update consistent)
        sj2 = sj._replace(valid=sj.valid & (s.f2row >= 0))
    inlier_now = sj2.valid & inlier_slots
    if cfg.use_huber:
        diagR = huber_robustify_R(sj2.inn, cfg.R, cfg.outlier_thresh,
                                  s.P.dtype)
    else:
        diagR = jnp.full((2 * cfg.dims.n_features,), cfg.R, s.P.dtype)
    err, P = measurement_update(s.P, sj2.H, sj2.inn, diagR, inlier_now)
    do_upd = jnp.any(inlier_now)
    err = jnp.where(do_upd, err, 0.0)
    P = jnp.where(do_upd, P, s.P)
    s = s._replace(P=P)
    s = absorb_error(cfg, s, err)

    # record predicted pixels for accessors / LK seeding
    # (Feature::Predict bookkeeping, src/estimator.cpp:1251)
    fr = s.features
    tgt_rows = jnp.where(sj2.valid, s.f2row, cfg.dims.nf_rows)
    oh_pred = (tgt_rows[:, None]
               == jnp.arange(cfg.dims.nf_rows)[None, :])       # (S, NF)
    hit_pred = jnp.any(oh_pred, axis=0)
    new_pred = jnp.einsum("sf,sk->fk", oh_pred.astype(fr.pred.dtype),
                          sj2.pred.astype(fr.pred.dtype),
                          precision=HIGHEST)
    fr = fr._replace(pred=jnp.where(hit_pred[:, None], new_pred, fr.pred))
    s = s._replace(features=fr)

    # post-update bookkeeping
    s = _create_group_and_init_tracks(cfg, s)
    s = _adapt_initial_depth(cfg, s)
    s = _enforce_max_group_lifetime(cfg, s)
    s = _switch_gauge_group(cfg, s)
    s = s._replace(vision_counter=s.vision_counter + 1)

    inn_masked = sj2.inn.reshape(-1, 2) * inlier_now[:, None]
    inn_rms = jnp.sqrt(jnp.sum(inn_masked ** 2)
                       / jnp.maximum(2 * jnp.sum(inlier_now), 1))
    out = StepOutputs(
        Rsb=s.X.Rsb, Tsb=s.X.Tsb, Vsb=s.X.Vsb,
        num_instate_features=jnp.sum((s.f2row >= 0).astype(jnp.int32)),
        num_instate_groups=jnp.sum((s.g2row >= 0).astype(jnp.int32)),
        num_tracked=jnp.sum((s.features.track == TS_TRACKED)
                            .astype(jnp.int32)),
        num_mh_rejected=num_rej,
        num_oneptransac_rejected=num_1pt,
        num_tracker_outlier_rejected=s.n_tracker_rejected,
        inn_rms=inn_rms,
        num_oos_dropped=n_oos_dropped)
    return s, out


def _propagate_frame_fast(cfg: VIOConfig, s: VIOState, imu_gyro, imu_accel,
                          imu_dt, dt_eff) -> VIOState:
    """Fast-mode frame propagation: compose per-sample transitions and
    touch the big covariance exactly once (see propagate_interval_fast)."""
    from .propagate import (propagate_interval_fast,
                            propagate_interval_fast_static)
    m = L.MOTION
    dtype = s.P.dtype
    eye = jnp.eye(m, dtype=dtype)
    prop_interval = (propagate_interval_fast_static
                     if cfg.fast_substeps > 0 else propagate_interval_fast)

    def body(carry, inp):
        X, Phi, Q, lg, la, sg, sa, nprop = carry
        gy, ac, dti = inp

        def do(_):
            dts = jnp.maximum(dti, 1e-12)
            sgn = (gy - lg) / dts
            san = (ac - la) / dts
            Xn, Phi_i, Qi = prop_interval(cfg, X, lg, la, sgn, san, dti)
            return (Xn, Phi_i @ Phi, Phi_i @ Q @ Phi_i.T + Qi, gy, ac,
                    sgn.astype(dtype), san.astype(dtype), nprop + 1)

        return jax.lax.cond(dti > 0, do, lambda _: carry, None), None

    init = (s.X, eye, jnp.zeros((m, m), dtype), s.last_gyro, s.last_accel,
            s.slope_gyro, s.slope_accel, jnp.zeros((), jnp.int32))
    # full unroll: the IMU axis is short (packing trims it to the real
    # max samples/frame) and each iteration is tiny 39x39 work — letting
    # XLA fuse across samples beats the sequential while-loop overhead
    (X, Phi, Q, lg, la, sg, sa, nprop), _ = jax.lax.scan(
        body, init, (imu_gyro, imu_accel, imu_dt),
        unroll=int(imu_dt.shape[0]))

    # visual-frame extrapolation segment
    def vis(_):
        Xn, Phi_i, Qi = prop_interval(cfg, X, lg, la, sg, sa, dt_eff)
        return (Xn, Phi_i @ Phi, Phi_i @ Q @ Phi_i.T + Qi,
                lg + sg * dt_eff, la + sa * dt_eff, nprop + 1)

    X, Phi, Q, lg, la, nprop = jax.lax.cond(
        dt_eff > 0, vis,
        lambda _: (X, Phi, Q, lg, la, nprop), None)

    if cfg.use_oc:
        from .propagate import oc_correct_phi
        Phi = oc_correct_phi(cfg, Phi, X, s.oc_R, s.oc_V, s.oc_T, s.X.Rsg)
        s = s._replace(oc_R=X.Rsb, oc_V=X.Vsb, oc_T=X.Tsb)

    # one covariance application per frame
    qm = jnp.zeros((m,), dtype)
    qm = qm.at[L.WSB:L.WSB + 3].set(cfg.Qmodel_Wsb ** 2)
    qm = qm.at[L.WBC:L.WBC + 3].set(cfg.Qmodel_Wbc ** 2)
    if cfg.Qmodel_Tbc > 0:    # static guard: keep the default jaxpr
        qm = qm.at[L.TBC:L.TBC + 3].set(cfg.Qmodel_Tbc ** 2)
    qm = qm.at[L.WSG:L.WSG + 2].set(cfg.Qmodel_Wsg ** 2)
    Qd = Q + nprop.astype(dtype) * jnp.diag(qm)
    if cfg.covariance_form == "sqrt":
        # exact row transform + ONE Gram/Cholesky re-compression that
        # absorbs Qd and last frame's admission-band slack together
        from .sqrt_form import factor_propagate_absorb
        P = factor_propagate_absorb(cfg, s.P, Phi, Qd)
    else:
        Pmm = Phi @ s.P[:m, :m] @ Phi.T + Qd
        Pms = Phi @ s.P[:m, m:]
        P = s.P.at[:m, :m].set(0.5 * (Pmm + Pmm.T))
        P = P.at[:m, m:].set(Pms)
        P = P.at[m:, :m].set(Pms.T)
    if cfg.fast_substeps > 0:
        # substeps skip the polar projection; restore orthonormality once
        # per frame (stricter than the reference's every-50-updates
        # normalize, src/core.h:154-161)
        X = X._replace(Rsb=so3.project(X.Rsb))
    return s._replace(X=X, P=P, last_gyro=lg, last_accel=la,
                      slope_gyro=sg, slope_accel=sa)


def propagate_frame(cfg: VIOConfig, s: VIOState, imu_gyro, imu_accel,
                    imu_dt, frame_dt) -> VIOState:
    """Frame-interval propagation: IMU samples + extrapolation to frame
    time, dispatched on cfg.propagation_mode. Shared by every frame
    variant (point-cloud, image, mapped). Traced under float32 matmul
    precision — see update_step."""
    # With online temporal calibration the effective frame time shifts by
    # the CURRENT td estimate relative to the shift already applied — the
    # in-graph equivalent of the reference's host-side ts += td
    # (src/estimator.cpp:943-951).
    if cfg.online_temporal_calib:
        dt_eff = jnp.maximum(frame_dt + s.X.td - s.td_applied, 0.0)
        s = s._replace(td_applied=s.X.td.astype(s.td_applied.dtype))
    else:
        dt_eff = frame_dt

    with jax.default_matmul_precision("float32"):
        if cfg.propagation_mode == "batched":
            from .propagate_batched import propagate_frame_batched
            s = propagate_frame_batched(cfg, s, imu_gyro, imu_accel,
                                        imu_dt, dt_eff)
        elif cfg.propagation_mode == "fast":
            s = _propagate_frame_fast(cfg, s, imu_gyro, imu_accel, imu_dt,
                                      dt_eff)
        else:
            def imu_body(s, inp):
                gy, ac, dt = inp
                return imu_sample_update(cfg, s, gy, ac, dt), None

            s, _ = jax.lax.scan(imu_body, s, (imu_gyro, imu_accel, imu_dt))
            s = jax.lax.cond(dt_eff > 0,
                             lambda s: propagate_state(cfg, s, dt_eff, True),
                             lambda s: s, s)
    return s


def vio_frame(cfg: VIOConfig, s: VIOState, imu_gyro, imu_accel, imu_dt,
              frame_dt, meas_id, meas_xp, meas_depth, meas_valid):
    """One full visual frame: IMU scan + propagation to frame time +
    tracker + update step. This is THE function to jit/scan/vmap."""
    s = propagate_frame(cfg, s, imu_gyro, imu_accel, imu_dt, frame_dt)
    s = tracker_pointcloud(cfg, s, meas_id, meas_xp, meas_depth, meas_valid)
    return update_step(cfg, s)
