"""Mapped VIO frame steps: filter + retirement + loop closure.

Composition points mirroring the reference: retirement feeds the map
when instate features leave the tracker (Estimator::DiscardFeatures ->
Mapper::AddFeature, src/estimator.cpp:1337-1349), and CloseLoop runs
after each visual update (src/app/vio.cpp:75-77).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..filter.config import VIOConfig
from ..filter.pipeline import (propagate_frame as _propagate_frame,
                               tracker_pointcloud, update_step)
from ..filter.state import TS_DROPPED, TS_TRACKED, VIOState
from .mapper import MapState, close_loop, retire_features


def _keyframe_insert(cfg: VIOConfig, s: VIOState, ms: MapState):
    """Periodic snapshot of instate features into the map
    (cfg.lc_keyframe_every; see config.py — smooth trajectories never
    drop tracks, so the death-only map starves)."""
    if cfg.lc_keyframe_every <= 0:
        return ms
    fr = s.features
    do = (s.vision_counter % cfg.lc_keyframe_every) == 0
    mask = fr.active & (fr.sind >= 0) & (fr.track == TS_TRACKED) & do
    return retire_features(cfg, s, ms, mask)


def vio_frame_mapped(cfg: VIOConfig, s: VIOState, ms: MapState,
                     imu_gyro, imu_accel, imu_dt, frame_dt,
                     meas_id, meas_xp, meas_depth, meas_valid):
    """Point-cloud frame step with mapping + loop closure."""
    s = _propagate_frame(cfg, s, imu_gyro, imu_accel, imu_dt, frame_dt)
    s = tracker_pointcloud(cfg, s, meas_id, meas_xp, meas_depth,
                           meas_valid)
    # retirement: instate features the tracker just dropped still carry
    # their state here (update_step clears them)
    fr = s.features
    retire = fr.active & (fr.track == TS_DROPPED) & (fr.sind >= 0)
    ms = retire_features(cfg, s, ms, retire)
    s, out = update_step(cfg, s)
    ms = _keyframe_insert(cfg, s, ms)
    if cfg.detect_loop_closures:
        s, n_lc = close_loop(cfg, s, ms,
                             nn_dist_thresh=cfg.lc_nn_dist_thresh,
                             ransac_thresh=cfg.lc_ransac_thresh,
                             min_matches=cfg.lc_min_matches)
    else:
        n_lc = jnp.asarray(0, jnp.int32)
    return s, ms, out, n_lc


def vio_frame_image_mapped(cfg: VIOConfig, s: VIOState, fes, ms: MapState,
                           imu_gyro, imu_accel, imu_dt, frame_dt, image):
    """Image frame step with mapping + loop closure."""
    from ..frontend.tracker import tracker_image
    s = _propagate_frame(cfg, s, imu_gyro, imu_accel, imu_dt, frame_dt)
    s, fes = tracker_image(cfg, s, fes, image)
    fr = s.features
    retire = fr.active & (fr.track == TS_DROPPED) & (fr.sind >= 0)
    ms = retire_features(cfg, s, ms, retire)
    s, out = update_step(cfg, s)
    ms = _keyframe_insert(cfg, s, ms)
    if cfg.detect_loop_closures:
        s, n_lc = close_loop(cfg, s, ms,
                             nn_dist_thresh=cfg.lc_nn_dist_thresh,
                             ransac_thresh=cfg.lc_ransac_thresh,
                             min_matches=cfg.lc_min_matches)
    else:
        n_lc = jnp.asarray(0, jnp.int32)
    return s, fes, ms, out, n_lc
