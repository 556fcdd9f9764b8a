"""Image tracker: LK tracking + FAST detection over the filter's tables.

Port of Tracker::UpdateLK / DetectLK (src/tracker.cpp:463-629, 219-329)
onto the masked FeatureTable, plus ``vio_frame_image`` — the image-mode
analogue of the point-cloud ``vio_frame``: one jitted call per camera
frame containing IMU propagation, prediction, LK, masked detection,
BRIEF extraction, and the full filter update step.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..filter import layout as L
from ..filter.config import VIOConfig
from ..ops.dense import HIGHEST
from ..filter.features import predict_pixel
from ..filter.pipeline import StepOutputs, update_step, _clear_feature_rows, \
    _rank_assign
from ..filter.state import (FS_CREATED, TS_CREATED, TS_DROPPED, TS_NONE,
                            TS_TRACKED, VIOState)
from . import brief
from .fast import fast_score, nms3, select_topk, shi_tomasi_score
from .image import blur5, build_pyramid
from .lk import track


class FrontendState(NamedTuple):
    """Image state carried between frames (the prev pyramid)."""
    pyr: Tuple[jnp.ndarray, ...]   # previous image pyramid
    initialized: jnp.ndarray       # () bool


def init_frontend(cfg: VIOConfig) -> FrontendState:
    rows, cols = int(cfg.cam_params[0]), int(cfg.cam_params[1])
    pyr = []
    h, w = rows, cols
    for _ in range(cfg.klt_max_level):
        pyr.append(jnp.zeros((h, w), jnp.float32))
        h, w = (h + 1) // 2, (w + 1) // 2
    return FrontendState(pyr=tuple(pyr), initialized=jnp.asarray(False))


def _detect_score(cfg: VIOConfig, img):
    """Detector factory (src/tracker.cpp:36-97):
    FAST | AGAST | GFTT | ORB (oFAST: FAST ranked by Harris) |
    BRISK (scale-persistent AGAST). SIFT/SURF are deliberate cuts —
    the float-descriptor family is out of the binary-Hamming design
    (see frontend/descriptors.py docstring)."""
    det = cfg.detector.upper()
    if det == "GFTT":
        return shi_tomasi_score(img)
    if det == "AGAST":
        from .fast import agast_score
        return agast_score(img, cfg.fast_threshold)
    if det in ("ORB", "OFAST"):
        from .fast import ofast_score
        return ofast_score(img, cfg.fast_threshold)
    if det == "BRISK":
        from .fast import brisk_score
        return brisk_score(img, cfg.fast_threshold)
    return fast_score(img, cfg.fast_threshold)


def tracker_image(cfg: VIOConfig, s: VIOState, fes: FrontendState,
                  image) -> Tuple[VIOState, FrontendState]:
    """One tracker update from an (H, W) float image."""
    fr = s.features
    gr = s.groups
    NF = fr.fid.shape[0]
    NG = gr.gid.shape[0]
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    pyr_new = tuple(build_pyramid(image.astype(jnp.float32),
                                  cfg.klt_max_level))

    active = fr.active

    # initial guesses: filter prediction (Feature::Predict) or previous
    # position (use_prediction=false, the TUM-VI setting)
    if cfg.use_prediction:
        grow = jnp.clip(fr.ref, 0, NG - 1)

        def pred_one(x, g):
            xp, depth = predict_pixel(kind, s.cam, s.X, gr.Rsb[g],
                                      gr.Tsb[g], x)
            return xp

        guesses = jax.vmap(pred_one)(fr.x, grow)
        guesses = jnp.where((fr.ref >= 0)[:, None], guesses, fr.xp)
    else:
        guesses = fr.xp

    new_xy, ok = track(list(fes.pyr), list(pyr_new), fr.xp, guesses, active,
                       win_size=cfg.klt_win_size, iters=cfg.klt_max_iter,
                       eps=cfg.klt_eps)
    # first frame: nothing to track against
    ok = ok & fes.initialized
    disp_ok = jnp.linalg.norm(new_xy - fr.xp, axis=1) \
        < cfg.max_pixel_displacement
    tracked = active & ok & disp_ok

    n_rej = jnp.zeros((), jnp.int32)
    if cfg.do_outlier_rejection:
        # homography-consistency rejection (Tracker::OutlierRejection,
        # src/tracker.cpp:705-753)
        from .homography import homography_ransac
        key, sub = jax.random.split(s.key)
        s = s._replace(key=key)
        inl, hok = homography_ransac(
            sub, fr.xp, new_xy, tracked,
            thresh=cfg.homography_reproj_thresh)
        n_rej = jnp.sum((tracked & ~inl).astype(jnp.int32))
        tracked = tracked & inl
    s = s._replace(n_tracker_rejected=n_rej)

    if cfg.extract_descriptor and cfg.descriptor_distance_thresh > 0:
        # descriptor-drift check on tracked points (UpdateLK's optional
        # descriptor gate, src/tracker.cpp:520-560): re-extract at the
        # new position and drop tracks whose BRIEF changed too much
        from .image import blur5 as _blur5
        sm0 = _blur5(pyr_new[0])
        from .descriptors import KINDS, extract as desc_extract
        dk = KINDS[cfg.descriptor_type]
        new_desc = jax.vmap(lambda p: desc_extract(dk, sm0, p))(new_xy)
        ddist = brief.hamming(fr.desc, new_desc)
        keep_desc = ddist < cfg.descriptor_distance_thresh
        tracked = tracked & keep_desc
        fr = fr._replace(desc=jnp.where(tracked[:, None], new_desc,
                                        fr.desc))

    dropped = active & ~tracked

    fr = fr._replace(
        track=jnp.where(tracked, TS_TRACKED,
                        jnp.where(dropped, TS_DROPPED, fr.track)),
        xp=jnp.where(tracked[:, None], new_xy.astype(fr.xp.dtype), fr.xp))

    # detection when the live-track count falls below num_features_min
    n_live = jnp.sum(tracked.astype(jnp.int32))
    need = n_live < cfg.num_features_min
    budget = jnp.maximum(cfg.num_features_max - n_live, 0)

    score = nms3(_detect_score(cfg, pyr_new[0]))

    K_DET = 64  # static per-frame detection budget
    det_xy, det_score, det_ok = select_topk(
        score, K_DET, cfg.margin, fr.xp, tracked, cfg.mask_size)
    det_ok = det_ok & need & (jnp.arange(K_DET) < budget)

    img_smooth = blur5(pyr_new[0])
    if cfg.extract_descriptor:
        from .descriptors import KINDS, extract as desc_extract
        dk = KINDS[cfg.descriptor_type]
        descs = jax.vmap(lambda p: desc_extract(dk, img_smooth, p))(det_xy)
    else:
        descs = jnp.zeros((K_DET, 8), jnp.uint32)

    if cfg.match_dropped_tracks and cfg.extract_descriptor:
        # dropped-track rescue (src/tracker.cpp:245-311): match fresh
        # detections against just-dropped tracks by descriptor distance
        # + displacement; revive instead of re-creating
        dthresh = cfg.descriptor_distance_thresh \
            if cfg.descriptor_distance_thresh > 0 else 50
        just_dropped = dropped
        D = brief.hamming_matrix(fr.desc, descs)          # (NF, K_DET)
        disp = jnp.linalg.norm(fr.xp[:, None, :] - det_xy[None, :, :],
                               axis=-1)
        match_ok = just_dropped[:, None] & det_ok[None, :] \
            & (D < dthresh) & (disp < cfg.max_pixel_displacement)
        Dm = jnp.where(match_ok, D, 10_000)
        best_det = jnp.argmin(Dm, axis=1)
        has = jnp.min(Dm, axis=1) < 10_000
        # one detection revives at most one track: keep the best track
        # per detection
        det_oh = jax.nn.one_hot(jnp.where(has, best_det, K_DET), K_DET,
                                dtype=jnp.int32)
        first_track = jnp.argmax(det_oh, axis=0)          # (K_DET,)
        claimed_by = jnp.where(jnp.any(det_oh > 0, axis=0),
                               first_track, -1)
        revive = has & (claimed_by[jnp.clip(best_det, 0, K_DET - 1)]
                        == jnp.arange(fr.fid.shape[0]))
        rx = det_xy[jnp.clip(best_det, 0, K_DET - 1)]
        fr = fr._replace(
            track=jnp.where(revive, TS_TRACKED, fr.track),
            xp=jnp.where(revive[:, None], rx.astype(fr.xp.dtype), fr.xp))
        tracked = tracked | revive
        dropped = dropped & ~revive
        used = jnp.any(
            revive[:, None] & (best_det[:, None]
                               == jnp.arange(K_DET)[None, :]), axis=0)
        det_ok = det_ok & ~used

    s, fr = _spawn_detections(s, fr, det_xy, det_score, descs, det_ok,
                              free=~fr.active & ~tracked)
    s = s._replace(features=fr)
    fes = FrontendState(pyr=pyr_new, initialized=jnp.asarray(True))
    return s, fes


def _spawn_detections(s: VIOState, fr, det_xy, det_score, descs, det_ok,
                      free):
    """Create new tracks from detections into free slots (shared by the
    LK and MATCH tracker modes; Feature::Create path of
    src/tracker.cpp:312-328,440-457)."""
    NF = fr.fid.shape[0]
    slot_of_det, got = _rank_assign(free, det_ok, -det_score)
    tgt = jnp.where(got, slot_of_det, NF)

    dtype = fr.xp.dtype
    new_fids = (s.next_fid + jnp.cumsum(got.astype(jnp.int32)) - 1
                ).astype(jnp.int32)
    # one-hot placement (no traced-index scatters)
    oh = tgt[:, None] == jnp.arange(NF, dtype=jnp.int32)[None, :]  # (K, NF)
    hit = jnp.any(oh, axis=0)
    ohf = oh.astype(dtype)
    put_fid = jnp.sum(oh * new_fids[:, None], axis=0, dtype=jnp.int32)
    put_xy = jnp.einsum("kf,kc->fc", ohf, det_xy.astype(dtype),
                        precision=HIGHEST)
    put_desc = jnp.sum(oh[:, :, None] * descs[:, None, :], axis=0,
                       dtype=descs.dtype)
    fr = fr._replace(
        fid=jnp.where(hit, put_fid, fr.fid),
        status=jnp.where(hit, FS_CREATED, fr.status),
        track=jnp.where(hit, TS_CREATED, fr.track),
        ref=jnp.where(hit, -1, fr.ref),
        sind=jnp.where(hit, -1, fr.sind),
        init_counter=jnp.where(hit, 0, fr.init_counter),
        lifetime=jnp.where(hit, 0, fr.lifetime),
        outlier_counter=jnp.where(hit, 0.0, fr.outlier_counter),
        xp=jnp.where(hit[:, None], put_xy, fr.xp),
        tri_ok=jnp.where(hit, False, fr.tri_ok),
        adj=jnp.where(hit[:, None], False, fr.adj),
        sim_depth=jnp.where(hit, jnp.asarray(-1.0, fr.sim_depth.dtype),
                            fr.sim_depth),
        desc=jnp.where(hit[:, None], put_desc, fr.desc),
    )
    s = s._replace(next_fid=s.next_fid + jnp.sum(got.astype(jnp.int32)))
    return s, fr


def tracker_match(cfg: VIOConfig, s: VIOState, fes: FrontendState,
                  image) -> Tuple[VIOState, FrontendState]:
    """MATCH tracker mode (Tracker::UpdateMatch, src/tracker.cpp:341-460):
    detect + extract descriptors every frame, brute-force mutual-best
    Hamming matching (knnMatch with crossCheck) against the live track
    table, descriptor-distance + displacement gates, optional homography
    outlier rejection; unmatched tracks drop, unmatched detections fill
    free slots up to ``num_features_max``.

    TPU re-design: the knnMatch loop becomes ONE (NF, K_DET) XOR+popcount
    Hamming matrix with argmin reductions both ways — no per-track
    branching, fully MXU/VPU-resident.
    """
    fr = s.features
    NF = fr.fid.shape[0]

    pyr_new = tuple(build_pyramid(image.astype(jnp.float32),
                                  cfg.klt_max_level))

    score = nms3(_detect_score(cfg, pyr_new[0]))

    K_DET = 128  # static per-frame detection budget (MATCH re-detects all)
    # no occupancy masking: UpdateMatch detects everywhere (no MaskOut)
    no_occ = jnp.zeros((1,), bool)
    det_xy, det_score, det_ok = select_topk(
        score, K_DET, cfg.margin, jnp.zeros((1, 2), jnp.float32), no_occ,
        cfg.mask_size)

    img_smooth = blur5(pyr_new[0])
    from .descriptors import KINDS, extract as desc_extract
    dk = KINDS[cfg.descriptor_type]
    descs = jax.vmap(lambda p: desc_extract(dk, img_smooth, p))(det_xy)

    # --- mutual-best Hamming matching against live tracks ---
    BIG = jnp.int32(1 << 20)
    D = brief.hamming_matrix(fr.desc, descs).astype(jnp.int32)  # (NF, K)
    pair_ok = fr.active[:, None] & det_ok[None, :]
    Dm = jnp.where(pair_ok, D, BIG)
    best_det = jnp.argmin(Dm, axis=1)                 # (NF,)
    best_val = jnp.min(Dm, axis=1)
    best_feat = jnp.argmin(Dm, axis=0)                # (K,)
    mutual = best_feat[best_det] == jnp.arange(NF, dtype=best_feat.dtype)
    has = (best_val < BIG) & mutual & fes.initialized

    new_xy = det_xy[best_det]
    disp_ok = jnp.linalg.norm(new_xy - fr.xp, axis=1) \
        < cfg.max_pixel_displacement
    if cfg.descriptor_distance_thresh > 0:
        has = has & (best_val < cfg.descriptor_distance_thresh)
    matched = fr.active & has & disp_ok

    n_rej = jnp.zeros((), jnp.int32)
    if cfg.do_outlier_rejection:
        from .homography import homography_ransac
        key, sub = jax.random.split(s.key)
        s = s._replace(key=key)
        inl, hok = homography_ransac(
            sub, fr.xp, new_xy, matched,
            thresh=cfg.homography_reproj_thresh)
        n_rej = jnp.sum((matched & ~inl).astype(jnp.int32))
        matched = matched & inl
    s = s._replace(n_tracker_rejected=n_rej)

    dropped = fr.active & ~matched
    fr = fr._replace(
        track=jnp.where(matched, TS_TRACKED,
                        jnp.where(dropped, TS_DROPPED, fr.track)),
        xp=jnp.where(matched[:, None], new_xy.astype(fr.xp.dtype), fr.xp))
    if cfg.differential_match:
        # cfg "differential": refresh the stored descriptor each frame
        fr = fr._replace(desc=jnp.where(matched[:, None],
                                        descs[best_det], fr.desc))

    # detections claimed by a match can't spawn (trash-row scatter drop)
    used = jnp.zeros((K_DET,), bool).at[
        jnp.where(matched, best_det, K_DET)].set(True)
    n_live = jnp.sum(matched.astype(jnp.int32))
    budget = jnp.maximum(cfg.num_features_max - n_live, 0)
    spawn_ok = det_ok & ~used \
        & (jnp.cumsum((det_ok & ~used).astype(jnp.int32)) <= budget)

    s, fr = _spawn_detections(s, fr, det_xy, det_score, descs, spawn_ok,
                              free=~fr.active & ~matched)
    s = s._replace(features=fr)
    fes = FrontendState(pyr=pyr_new, initialized=jnp.asarray(True))
    return s, fes


def vio_frame_image(cfg: VIOConfig, s: VIOState, fes: FrontendState,
                    imu_gyro, imu_accel, imu_dt, frame_dt, image):
    """Image-mode frame step (the TUM-VI path): IMU scan + LK + filter."""
    from ..filter.pipeline import propagate_frame
    s = propagate_frame(cfg, s, imu_gyro, imu_accel, imu_dt, frame_dt)
    track_fn = tracker_match if cfg.tracker_type.upper() == "MATCH" \
        else tracker_image
    s, fes = track_fn(cfg, s, fes, image)
    s, out = update_step(cfg, s)
    return s, fes, out


def tracker_only_frame(cfg: VIOConfig, s: VIOState, fes: FrontendState,
                       image):
    """Front-end-only step (the feature_tracker_only app,
    src/app/feature_tracker_only.cpp): track + detect, no filter.

    With no filter to consume TS_DROPPED rows, free them here at the
    start of the next frame (the reference tracker erases dropped
    features on its next Update) so slots recycle and the live count
    stays bounded by num_features_max."""
    fr = s.features
    stale = fr.active & (fr.track == TS_DROPPED)
    s = s._replace(features=_clear_feature_rows(fr, stale))
    if cfg.tracker_type.upper() == "MATCH":
        return tracker_match(cfg, s, fes, image)
    return tracker_image(cfg, s, fes, image)
