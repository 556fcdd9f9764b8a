"""Streaming estimator API mirroring the pyxivo surface.

The host-side driver around the jitted device step: message reordering,
gravity initialization, IMU batching per visual frame, and the ~55
accessors of the reference Python binding (pybind11/pyxivo.cpp:332-398).
Heavy math never happens here — each visual frame is ONE device call.
"""
from __future__ import annotations

import heapq
import itertools
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..filter import layout as L
from ..filter.config import (VIOConfig, config_from_json,
                             load_json_with_comments)
from ..filter.pipeline import vio_frame
from ..filter.state import VIOState, init_state
from ..geom import so3

IMU_CAP = 32      # max IMU samples buffered per visual frame
MEAS_CAP = 256    # max point measurements per visual frame


class Estimator:
    """Drop-in analogue of pyxivo.Estimator for the point-cloud path."""

    def __init__(self, cfg, viewer_cfg=None, name: str = "",
                 tracker_only: bool = False, dims=None,
                 dtype: Optional[str] = None, **overrides):
        # positional signature mirrors pyxivo.Estimator(cfg, viewer_cfg,
        # name, tracker_only) (pybind11/pyxivo.cpp:19-40); viewer_cfg is
        # accepted for compatibility (viz.py replaces the Pangolin viewer)
        if isinstance(cfg, str):
            cfg = load_json_with_comments(cfg)
        if isinstance(cfg, dict):
            cfg = config_from_json(cfg, dims=dims, **overrides)
        if dtype is not None:
            cfg = cfg.__class__(**{**cfg.__dict__, "dtype": dtype})
        self.cfg: VIOConfig = cfg
        self.name = name
        self.tracker_only = tracker_only
        self.state: VIOState = init_state(cfg)
        if cfg.use_mapper:
            from ..map import init_map
            from ..map.integration import vio_frame_mapped
            import jax.numpy as _jnp
            self._map = init_map(cfg.map_capacity,
                                 dtype=_jnp.dtype(cfg.dtype))
            self._mapped_step = jax.jit(partial(vio_frame_mapped, cfg),
                                        donate_argnums=(0, 1))
        else:
            self._map = None
            self._mapped_step = None
        self._step = jax.jit(partial(vio_frame, cfg), donate_argnums=(0,))

        self.gravity_initialized = cfg.simulation  # sims skip gravity init
        self.vision_initialized = False
        self._grav_buf = []
        self._pending_imu = []     # [(ts, gyro, accel)]
        self._last_prop_time = None
        self._last_out = None
        self._seq = itertools.count()
        # out-of-order message reordering (src/estimator.cpp:923-941):
        # a min-heap of (ts, seq, kind, payload) drained once its depth
        # exceeds cfg.message_buffer_size; stragglers older than the
        # system clock are dropped (src/estimator.cpp:1108-1110,
        # GoodTimestamp at millisecond granularity). Size 0 = immediate
        # dispatch (the replay drivers feed pre-sorted streams).
        self._buf = []             # reorder heap [(ts, seq, kind, payload)]
        self._clock = -float("inf")
        self._n_misordered_dropped = 0
        self._fes = None           # frontend (image-path) state
        self._image_step = None
        self._tracker_step = None
        self._pc_tracker_step = None

    # ------------------------------------------------------------------
    # measurement entry points (pyxivo parity)
    # ------------------------------------------------------------------
    #
    # Every entry point routes through the reorder buffer: messages are
    # pushed onto a timestamp min-heap and executed oldest-first only
    # once the heap is deeper than cfg.message_buffer_size — the drain
    # semantics of Estimator::MaintainBuffer (src/estimator.cpp:923-941).
    # With message_buffer_size=0 (default) dispatch is immediate and
    # behavior is identical to in-order delivery. The online-td
    # timestamp shift happens at PUSH time for visual messages
    # (src/estimator.cpp:943-951), so reordering sees shifted stamps.

    def _push(self, ts: float, kind: str, payload, order_ts=None):
        """order_ts: heap/clock ordering key when it differs from the
        execution timestamp — visual messages order by their td-shifted
        stamp (src/estimator.cpp:943-951) while propagation intervals
        stay in the raw clock domain (the in-graph dt_eff correction in
        propagate_frame owns the td physics; shifting here too would
        double-apply the drift)."""
        key = ts if order_ts is None else order_ts
        if self.cfg.message_buffer_size <= 0:
            self._execute(ts, kind, payload)
            return
        heapq.heappush(self._buf, (key, next(self._seq), kind, ts, payload))
        while len(self._buf) > self.cfg.message_buffer_size:
            self._pop_execute()

    def _pop_execute(self):
        key, _, kind, ts, payload = heapq.heappop(self._buf)
        # GoodTimestamp (src/estimator.cpp:706-717): stragglers older
        # than the executed clock — at millisecond granularity, like the
        # reference's ms-truncated compare — are dropped, not rewound.
        if np.isfinite(self._clock) \
                and int(np.floor(key * 1e3)) < int(np.floor(self._clock * 1e3)):
            self._n_misordered_dropped += 1
            return
        self._clock = max(self._clock, key)
        self._execute(ts, kind, payload)

    def _execute(self, ts: float, kind: str, payload):
        if kind == "imu":
            self._inertial_meas_internal(ts, *payload)
        elif kind == "image":
            self._visual_meas_internal(ts, payload)
        elif kind == "pc":
            self._visual_meas_pc_internal(ts, *payload)
        elif kind == "image_tracker":
            self._visual_tracker_only_internal(ts, payload)
        elif kind == "pc_tracker":
            self._visual_pc_tracker_only_internal(ts, *payload)

    def flush(self):
        """Drain the reorder buffer (execute everything still queued).

        The reference never drains its tail — up to MESSAGE_BUFFER_SIZE
        messages are simply lost at shutdown. Finite-stream drivers here
        call flush() to process them; no-op when buffering is off.
        """
        while self._buf:
            self._pop_execute()

    def num_misordered_dropped(self):
        """Messages dropped for arriving with timestamps older than the
        executed clock (the reference logs and drops these,
        src/estimator.cpp:1108-1110)."""
        return self._n_misordered_dropped

    def InertialMeas(self, ts: float, gyro, accel):
        self._push(ts, "imu", (np.asarray(gyro, float),
                               np.asarray(accel, float)))

    def _inertial_meas_internal(self, ts: float, gyro, accel):
        if not self.gravity_initialized:
            self._grav_buf.append(accel)
            if len(self._grav_buf) >= max(self.cfg.gravity_init_counter, 1):
                self._init_gravity(ts, gyro, accel)
            return
        if not self.vision_initialized:
            # the reference discards inertial input until vision starts,
            # but keeps the latest sample as the propagation seed
            self._seed_imu(ts, gyro, accel)
            return
        self._pending_imu.append((ts, gyro, accel))

    def VisualMeas(self, ts: float, image):
        """Image-measurement frame (the LK/FAST path).

        `image` is an (H, W) array or a path loadable by io.load_image —
        mirroring pyxivo's dual path/array binding
        (pybind11/pyxivo.cpp:46-78). With online temporal calibration,
        the CURRENT td estimate shifts the message's ordering stamp at
        push time (src/estimator.cpp:943-951); the propagation interval
        itself is corrected in-graph (propagate_frame's dt_eff), so the
        shift is not applied twice.
        """
        if isinstance(image, str):
            from ..io import load_image
            image = load_image(image)
        image = np.asarray(image, np.float32)
        if self.tracker_only:
            self._push(ts, "image_tracker", image)
            return
        order_ts = ts + float(self.state.X.td) \
            if self.cfg.online_temporal_calib else None
        self._push(ts, "image", image, order_ts=order_ts)

    def _visual_meas_internal(self, ts: float, image):
        if not self.gravity_initialized:
            return
        if self._fes is None:
            from ..frontend import init_frontend, vio_frame_image
            self._fes = init_frontend(self.cfg)
            if self.cfg.use_mapper:
                # image frames route through the mapped step (retire ->
                # map, close_loop after the update) exactly like the
                # point-cloud path (src/app/vio.cpp:75-77)
                from ..map.integration import vio_frame_image_mapped
                self._image_step = jax.jit(
                    partial(vio_frame_image_mapped, self.cfg),
                    donate_argnums=(0, 1, 2))
            else:
                self._image_step = jax.jit(
                    partial(vio_frame_image, self.cfg),
                    donate_argnums=(0, 1))
        if not self.vision_initialized:
            self.vision_initialized = True
            self._last_prop_time = ts
            self._run_image_frame(ts, [], image)
            return
        self._run_image_frame(ts, self._pending_imu, image)
        self._pending_imu = []

    def _run_image_frame(self, ts, imu, image):
        dtype = np.dtype(self.cfg.dtype)
        gyro = np.zeros((IMU_CAP, 3), dtype)
        accel = np.zeros((IMU_CAP, 3), dtype)
        dts = np.zeros((IMU_CAP,), dtype)
        t_prev = self._last_prop_time
        for i, (t, gy, ac) in enumerate(imu[:IMU_CAP]):
            gyro[i] = gy
            accel[i] = ac
            dts[i] = max(t - t_prev, 0.0)
            t_prev = t
        frame_dt = max(ts - t_prev, 0.0)
        self._last_prop_time = ts
        if self.cfg.use_mapper:
            (self.state, self._fes, self._map, out,
             n_lc) = self._image_step(
                self.state, self._fes, self._map, jnp.asarray(gyro),
                jnp.asarray(accel), jnp.asarray(dts),
                jnp.asarray(dtype.type(frame_dt)), jnp.asarray(image))
            self._last_n_lc = int(n_lc)
        else:
            self.state, self._fes, out = self._image_step(
                self.state, self._fes, jnp.asarray(gyro),
                jnp.asarray(accel), jnp.asarray(dts),
                jnp.asarray(dtype.type(frame_dt)), jnp.asarray(image))
        self._last_out = out

    def VisualMeasPointCloud(self, ts: float, ids, xp_and_depths):
        """Synthetic-measurement frame (VisualMeasPointCloudInternal)."""
        ids = np.asarray(ids)
        xpd = np.asarray(xp_and_depths, float).reshape(-1, 3)
        if self.tracker_only:
            self._push(ts, "pc_tracker", (ids, xpd))
            return
        order_ts = ts + float(self.state.X.td) \
            if self.cfg.online_temporal_calib else None
        self._push(ts, "pc", (ids, xpd), order_ts=order_ts)

    def _visual_meas_pc_internal(self, ts: float, ids, xpd):
        if not self.gravity_initialized:
            return
        if not self.vision_initialized:
            self.vision_initialized = True
            self._last_prop_time = ts
            self._run_frame(ts, [], ids, xpd)
            return
        self._run_frame(ts, self._pending_imu, ids, xpd)
        self._pending_imu = []

    def VisualMeasTrackerOnly(self, ts: float, image):
        """Front-end only: track + detect, no filter (the
        feature_tracker_only app / CreateSystemTrackerOnly path)."""
        if isinstance(image, str):
            from ..io import load_image
            image = load_image(image)
        self._push(ts, "image_tracker", np.asarray(image, np.float32))

    def _visual_tracker_only_internal(self, ts: float, image):
        if self._fes is None:
            from ..frontend import init_frontend, tracker_only_frame
            self._fes = init_frontend(self.cfg)
            self._tracker_step = jax.jit(
                partial(tracker_only_frame, self.cfg),
                donate_argnums=(0, 1))
        self.state, self._fes = self._tracker_step(
            self.state, self._fes, jnp.asarray(image))
        self._last_prop_time = ts

    def VisualMeasPointCloudTrackerOnly(self, ts: float, ids,
                                        xp_and_depths):
        """Point-cloud tracker association only, no filter."""
        self._push(ts, "pc_tracker",
                   (np.asarray(ids),
                    np.asarray(xp_and_depths, float).reshape(-1, 3)))

    def _visual_pc_tracker_only_internal(self, ts: float, ids, xpd):
        from ..filter.pipeline import tracker_pointcloud
        if not hasattr(self, "_pc_tracker_step") \
                or self._pc_tracker_step is None:
            self._pc_tracker_step = jax.jit(
                partial(tracker_pointcloud, self.cfg),
                donate_argnums=(0,))
        dtype = np.dtype(self.cfg.dtype)
        mid = np.full((MEAS_CAP,), -1, np.int32)
        mxp = np.zeros((MEAS_CAP, 2), dtype)
        mdepth = np.full((MEAS_CAP,), -1.0, dtype)
        mvalid = np.zeros((MEAS_CAP,), bool)
        n = min(len(ids), MEAS_CAP)
        mid[:n] = ids[:n]
        mxp[:n] = xpd[:n, :2]
        mdepth[:n] = xpd[:n, 2]
        mvalid[:n] = True
        self.state = self._pc_tracker_step(
            self.state, jnp.asarray(mid), jnp.asarray(mxp),
            jnp.asarray(mdepth), jnp.asarray(mvalid))
        self._last_prop_time = ts

    def InitWithSimDepths(self):
        cfg = self.cfg
        self.cfg = cfg.__class__(**{**cfg.__dict__,
                                    "sim_initialize_depths": True})
        self._step = jax.jit(partial(vio_frame, self.cfg),
                             donate_argnums=(0,))

    def ScaleInitVelocity(self, scale: float):
        X = self.state.X
        self.state = self.state._replace(X=X._replace(Vsb=X.Vsb * scale))

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _init_gravity(self, ts, gyro, accel):
        """InitializeGravity parity (src/estimator.cpp:439-473)."""
        X = self.state.X
        mean_accel = np.mean(self._grav_buf, axis=0)
        Ca = np.asarray(X.Ca)
        accel_calib = Ca @ mean_accel - np.asarray(X.ba)
        g = -np.asarray(self.cfg.gravity)
        # rotation taking -g to accel_calib
        a = g / np.linalg.norm(g)
        b = accel_calib / max(np.linalg.norm(accel_calib), 1e-12)
        v = np.cross(a, b)
        s = np.linalg.norm(v)
        c = np.dot(a, b)
        w = v / s * np.arctan2(s, c) if s > 1e-12 else np.zeros(3)
        w[2] = 0.0
        Rsg = np.asarray(so3.exp(jnp.asarray(w)))
        dt = np.dtype(self.cfg.dtype)
        self.state = self.state._replace(X=X._replace(
            Rsg=jnp.asarray(Rsg, dt)))
        self._seed_imu(ts, gyro, accel)
        self.gravity_initialized = True
        self._grav_buf = []

    def _seed_imu(self, ts, gyro, accel):
        dt = np.dtype(self.cfg.dtype)
        self.state = self.state._replace(
            last_gyro=jnp.asarray(gyro, dt),
            last_accel=jnp.asarray(accel, dt),
            slope_gyro=jnp.zeros(3, dt), slope_accel=jnp.zeros(3, dt))
        self._last_prop_time = ts

    def _run_frame(self, ts, imu, ids, xpd):
        dtype = np.dtype(self.cfg.dtype)
        gyro = np.zeros((IMU_CAP, 3), dtype)
        accel = np.zeros((IMU_CAP, 3), dtype)
        dts = np.zeros((IMU_CAP,), dtype)
        t_prev = self._last_prop_time
        for i, (t, gy, ac) in enumerate(imu[:IMU_CAP]):
            gyro[i] = gy
            accel[i] = ac
            dts[i] = max(t - t_prev, 0.0)
            t_prev = t
        frame_dt = max(ts - t_prev, 0.0)
        self._last_prop_time = ts

        mid = np.full((MEAS_CAP,), -1, np.int32)
        mxp = np.zeros((MEAS_CAP, 2), dtype)
        mdepth = np.full((MEAS_CAP,), -1.0, dtype)
        mvalid = np.zeros((MEAS_CAP,), bool)
        n = min(len(ids), MEAS_CAP)
        if len(ids) > MEAS_CAP:
            # keep measurements of existing tracks first
            live = set(np.asarray(self.state.features.fid).tolist())
            pri = np.argsort([0 if int(i) in live else 1 for i in ids],
                             kind="stable")[:MEAS_CAP]
            ids, xpd = np.asarray(ids)[pri], xpd[pri]
        mid[:n] = np.asarray(ids[:n], np.int32)
        mxp[:n] = xpd[:n, :2]
        mdepth[:n] = xpd[:n, 2]
        mvalid[:n] = True

        if self._mapped_step is not None:
            self.state, self._map, out, n_lc = self._mapped_step(
                self.state, self._map, jnp.asarray(gyro),
                jnp.asarray(accel), jnp.asarray(dts),
                jnp.asarray(dtype.type(frame_dt)), jnp.asarray(mid),
                jnp.asarray(mxp), jnp.asarray(mdepth),
                jnp.asarray(mvalid))
            self._last_n_lc = int(n_lc)
        else:
            self.state, out = self._step(
                self.state, jnp.asarray(gyro), jnp.asarray(accel),
                jnp.asarray(dts), jnp.asarray(dtype.type(frame_dt)),
                jnp.asarray(mid), jnp.asarray(mxp), jnp.asarray(mdepth),
                jnp.asarray(mvalid))
        self._last_out = out

    # ------------------------------------------------------------------
    # accessors (pyxivo parity, pybind11/pyxivo.cpp:332-398)
    # ------------------------------------------------------------------

    def gsb(self):
        X = self.state.X
        return np.asarray(X.Rsb), np.asarray(X.Tsb)

    def gbc(self):
        X = self.state.X
        return np.asarray(X.Rbc), np.asarray(X.Tbc)

    def gsc(self):
        Rsb, Tsb = self.gsb()
        Rbc, Tbc = self.gbc()
        return Rsb @ Rbc, Rsb @ Tbc + Tsb

    def Vsb(self):
        return np.asarray(self.state.X.Vsb)

    def bg(self):
        return np.asarray(self.state.X.bg)

    def ba(self):
        return np.asarray(self.state.X.ba)

    def Rg(self):
        return np.asarray(self.state.X.Rsg)

    def td(self):
        return float(self.state.X.td)

    def Ca(self):
        return np.asarray(self.state.X.Ca)

    def Cg(self):
        return np.asarray(self.state.X.Cg)

    def _P_full(self):
        """Dense covariance regardless of representation (sqrt mode
        stores the factor; accessors expose P = S S^T)."""
        P = np.asarray(self.state.P)
        if P.shape[0] != P.shape[1]:
            P = P @ P.T
        return P

    def Pstate(self):
        return self._P_full()[:L.MOTION, :L.MOTION]

    def P(self):
        return self._P_full()

    def camera_intrinsics(self):
        return np.asarray(self.state.cam)

    def now(self):
        return self._last_prop_time

    def num_instate_features(self):
        return int((np.asarray(self.state.features.sind) >= 0).sum())

    def num_instate_groups(self):
        return int((np.asarray(self.state.groups.sind) >= 0).sum())

    def num_tracked_features(self):
        o = self._last_out
        return int(o.num_tracked) if o is not None else 0

    def num_mh_rejected(self):
        o = self._last_out
        return int(o.num_mh_rejected) if o is not None else 0

    def inn_rms(self):
        o = self._last_out
        return float(o.inn_rms) if o is not None else 0.0

    def InstateFeaturePositions(self):
        """Spatial positions of instate features (+ ids)."""
        fr = self.state.features
        gr = self.state.groups
        sel = np.asarray(fr.sind) >= 0
        x = np.asarray(fr.x)[sel]
        ref = np.asarray(fr.ref)[sel]
        Rbc, Tbc = self.gbc()
        Xs = []
        for xi, ri in zip(x, ref):
            z = np.exp(xi[2])
            Xc = np.array([xi[0] * z, xi[1] * z, z])
            R = np.asarray(gr.Rsb)[ri]
            T = np.asarray(gr.Tsb)[ri]
            Xs.append(R @ (Rbc @ Xc + Tbc) + T)
        ids = np.asarray(fr.fid)[sel]
        return np.asarray(Xs).reshape(-1, 3), ids

    def InstateGroupPoses(self):
        gr = self.state.groups
        sel = np.asarray(gr.sind) >= 0
        return (np.asarray(gr.Rsb)[sel], np.asarray(gr.Tsb)[sel],
                np.asarray(gr.gid)[sel])

    # -- remaining pyxivo surface (pybind11/pyxivo.cpp:332-398) --------

    def _instate_rows(self):
        fr = self.state.features
        sind = np.asarray(fr.sind)
        rows = np.nonzero(sind >= 0)[0]
        return rows[np.argsort(sind[rows])]

    def InstateFeatureIDs(self):
        return np.asarray(self.state.features.fid)[self._instate_rows()]

    def InstateFeatureSinds(self):
        return np.asarray(self.state.features.sind)[self._instate_rows()]

    def InstateFeatureRefGroups(self):
        fr = self.state.features
        gr = self.state.groups
        rows = self._instate_rows()
        return np.asarray(gr.gid)[np.asarray(fr.ref)[rows]]

    def InstateFeatureXc(self):
        """3D positions in the reference camera frame."""
        fr = self.state.features
        rows = self._instate_rows()
        x = np.asarray(fr.x)[rows]
        z = np.exp(x[:, 2])
        return np.stack([x[:, 0] * z, x[:, 1] * z, z], axis=1)

    def InstateFeaturexc(self):
        """Local parametrization (X/Z, Y/Z, log Z)."""
        return np.asarray(self.state.features.x)[self._instate_rows()]

    def InstateFeatureCovs(self):
        """Per-feature 3x3 blocks of the big covariance."""
        d = self.cfg.dims
        P = self._P_full()
        out = []
        for row in self._instate_rows():
            sl = int(np.asarray(self.state.features.sind)[row])
            off = d.feature_off(sl)
            out.append(P[off:off + 3, off:off + 3])
        return np.asarray(out).reshape(-1, 3, 3)

    def InstateFeaturePreds(self):
        return np.asarray(self.state.features.pred)[self._instate_rows()]

    def InstateFeatureMeas(self):
        return np.asarray(self.state.features.xp)[self._instate_rows()]

    def InstateGroupIDs(self):
        gr = self.state.groups
        sel = np.asarray(gr.sind) >= 0
        return np.asarray(gr.gid)[sel]

    def InstateGroupSinds(self):
        gr = self.state.groups
        sel = np.asarray(gr.sind) >= 0
        return np.asarray(gr.sind)[sel]

    def InstateGroupCovs(self):
        from ..filter import layout as L
        P = self._P_full()
        gr = self.state.groups
        out = []
        for sl in np.asarray(gr.sind)[np.asarray(gr.sind) >= 0]:
            off = L.GROUP_BEGIN + 6 * int(sl)
            out.append(P[off:off + 6, off:off + 6])
        return np.asarray(out).reshape(-1, 6, 6)

    def gauge_group(self):
        row = int(self.state.gauge_row)
        if row < 0:
            return -1
        return int(np.asarray(self.state.groups.gid)[row])

    def CameraIntrinsics(self):
        return np.asarray(self.state.cam)

    def CameraDistortionType(self):
        return self.cfg.cam_model

    def MeasurementUpdateInitialized(self):
        return self._last_out is not None

    def VisionInitialized(self):
        return self.vision_initialized

    def UsingLoopClosure(self):
        return self.cfg.use_mapper

    def num_oneptransac_rejected(self):
        o = self._last_out
        return int(o.num_oneptransac_rejected) if o is not None else 0

    def num_tracker_outlier_rejected(self):
        """Homography-RANSAC rejects this frame (Tracker counter
        parity, src/tracker.h:47-51 via pyxivo.cpp:332-398)."""
        o = self._last_out
        return int(o.num_tracker_outlier_rejected) if o is not None else 0

    def num_tracker_failed_to_track(self):
        fr = self.state.features
        from ..filter.state import TS_DROPPED
        return int((np.asarray(fr.track) == TS_DROPPED).sum())

    def num_tracker_new_detections(self):
        fr = self.state.features
        from ..filter.state import TS_CREATED
        return int((np.asarray(fr.track) == TS_CREATED).sum())

    def JustDroppedFeatureIDs(self):
        fr = self.state.features
        from ..filter.state import TS_DROPPED
        sel = np.asarray(fr.track) == TS_DROPPED
        return np.asarray(fr.fid)[sel]

    def tracked_features(self):
        """(id, x, y) of live tracks + descriptors."""
        fr = self.state.features
        from ..filter.state import TS_TRACKED
        sel = (np.asarray(fr.fid) >= 0) \
            & (np.asarray(fr.track) == TS_TRACKED)
        return (np.asarray(fr.fid)[sel], np.asarray(fr.xp)[sel],
                np.asarray(fr.desc)[sel])

    def tracked_features_no_descriptor(self):
        fid, xp, _ = self.tracked_features()
        return fid, xp

    def Visualize(self, save_path: Optional[str] = None,
                  live: bool = False, img=None):
        """Static track canvas, or — with live=True — an incremental 3D
        trajectory/frustum/landmark view (Viewer::Refresh parity,
        src/viewer.h:17-49) that persists across calls."""
        if live:
            if getattr(self, "_live_viewer", None) is None:
                from ..viz_live import LiveViewer
                p = self.cfg.cam_params
                self._live_viewer = LiveViewer(
                    name=self.name or "xivo_tpu",
                    imh=int(p[0]), imw=int(p[1]), fx=float(p[2]),
                    fy=float(p[3]), cx=float(p[4]), cy=float(p[5]))
            self._live_viewer.update_from_estimator(self, img=img)
            if save_path:
                self._live_viewer.save_frame(save_path)
            return self._live_viewer
        from ..viz import plot_tracks
        return plot_tracks(self, save_path)

    def CloseLoop(self):
        """Explicit loop-closure step against the accumulated map.

        When use_mapper is on, the per-frame step already closes loops
        (vio_frame_mapped); this triggers an extra pass — the
        `est->CloseLoop()` call of the vio app (src/app/vio.cpp:75-77).
        """
        if not self.cfg.use_mapper or self._map is None:
            return 0
        from ..map import close_loop
        self.state, n = close_loop(
            self.cfg, self.state, self._map,
            nn_dist_thresh=self.cfg.lc_nn_dist_thresh,
            ransac_thresh=self.cfg.lc_ransac_thresh,
            min_matches=self.cfg.lc_min_matches)
        return int(n)

    # -- checkpoint / resume (absent in the reference; SURVEY §5 names
    #    it as a required first-class improvement) ----------------------

    def save_checkpoint(self, path: str):
        import pickle
        blob = dict(
            state=jax.tree.map(np.asarray, self.state),
            fes=jax.tree.map(np.asarray, self._fes)
            if self._fes is not None else None,
            map=jax.tree.map(np.asarray, getattr(self, "_map", None))
            if getattr(self, "_map", None) is not None else None,
            meta=dict(gravity_initialized=self.gravity_initialized,
                      vision_initialized=self.vision_initialized,
                      last_prop_time=self._last_prop_time,
                      pending_imu=self._pending_imu,
                      grav_buf=self._grav_buf,
                      reorder_buf=list(self._buf),
                      clock=self._clock,
                      n_misordered=self._n_misordered_dropped))
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    def load_checkpoint(self, path: str):
        import pickle
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.state = jax.tree.map(jnp.asarray, blob["state"])
        if blob["fes"] is not None:
            from ..frontend import FrontendState
            self._fes = jax.tree.map(jnp.asarray, blob["fes"])
        if blob.get("map") is not None:
            self._map = jax.tree.map(jnp.asarray, blob["map"])
        m = blob["meta"]
        self.gravity_initialized = m["gravity_initialized"]
        self.vision_initialized = m["vision_initialized"]
        self._last_prop_time = m["last_prop_time"]
        self._pending_imu = m.get("pending_imu", [])
        self._grav_buf = m.get("grav_buf", [])
        self._buf = list(m.get("reorder_buf", []))
        heapq.heapify(self._buf)
        self._clock = m.get("clock", -float("inf"))
        self._n_misordered_dropped = m.get("n_misordered", 0)
