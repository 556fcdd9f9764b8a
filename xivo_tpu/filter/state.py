"""Filter state pytrees and initialization.

Replaces the reference's singleton web (Estimator/Graph/MemoryManager/
CameraManager instances wired by ``src/factory.cpp:17-82``) with one
immutable ``VIOState`` pytree threaded through pure functions.

Dynamic structure becomes fixed-capacity masked tables:
  * ``FeatureTable`` — the track pool (MemoryManager slots, ``src/mm.cpp``)
    + per-feature subfilter (``src/feature.h``) + its row of the
    visibility graph (``src/graphbase.h:46-61``) as a dense adjacency
    matrix over group rows.
  * ``GroupTable`` — pose anchors (``src/group.h``).
Slot indices (``sind``) map table rows into the EKF error-state window,
mirroring the reference's gsel_/fsel_ boolean slot arrays
(``src/estimator.h:425-427``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import cam as cam_mod
from ..geom import so3
from . import layout
from .config import VIOConfig

# feature status codes (cf. FeatureStatus, src/core.h:190-199)
FS_EMPTY = 0
FS_CREATED = 1
FS_INITIALIZING = 2
FS_READY = 3
FS_INSTATE = 4
FS_GAUGE = 5

# track status codes (cf. TrackStatus, src/core.h:185-189)
TS_NONE = 0
TS_CREATED = 1
TS_TRACKED = 2
TS_DROPPED = 3


class MotionState(NamedTuple):
    """Nominal motion + calibration state (cf. State, src/core.h:117-180)."""
    Rsb: jnp.ndarray   # (3,3) body -> spatial
    Tsb: jnp.ndarray   # (3,)
    Vsb: jnp.ndarray   # (3,)
    bg: jnp.ndarray    # (3,)
    ba: jnp.ndarray    # (3,)
    Rbc: jnp.ndarray   # (3,3) camera -> body
    Tbc: jnp.ndarray   # (3,)
    Rsg: jnp.ndarray   # (3,3) gravity -> spatial
    td: jnp.ndarray    # () temporal offset
    Cg: jnp.ndarray    # (3,3) gyro intrinsics
    Ca: jnp.ndarray    # (3,3) accel intrinsics (upper-triangular)


class GroupTable(NamedTuple):
    gid: jnp.ndarray       # (NG,) int32, -1 = empty row
    Rsb: jnp.ndarray       # (NG,3,3)
    Tsb: jnp.ndarray       # (NG,3)
    lifetime: jnp.ndarray  # (NG,) int32
    sind: jnp.ndarray      # (NG,) int32, EKF slot or -1
    Rsb_fej: jnp.ndarray   # (NG,3,3) first-estimate pose (FEJ)
    Tsb_fej: jnp.ndarray   # (NG,3)
    # True while the row is a PURE pose clone (entered the EKF window by
    # clone_frame_groups/use_OOS cloning, anchors no instate features).
    # Clones are a separate slot class: never a trickle-admission anchor
    # (pipeline._admit_features_within_groups) and "graduate" to a
    # feature-anchor group only through the gated _admit_groups path —
    # this keeps admission cadence identical to the non-cloning filter
    # (the round-4 clone-ATE regression: instate-at-birth groups let
    # lenient-phase features into the EKF frames early, permanently
    # poisoning the startup landmark map).
    is_clone: jnp.ndarray  # (NG,) bool

    @property
    def active(self):
        return self.gid >= 0

    @property
    def instate(self):
        return self.sind >= 0


class FeatureTable(NamedTuple):
    fid: jnp.ndarray        # (NF,) int32, -1 = empty row
    status: jnp.ndarray     # (NF,) int32 FS_*
    track: jnp.ndarray      # (NF,) int32 TS_*
    ref: jnp.ndarray        # (NF,) int32 group-table ROW index, -1
    x: jnp.ndarray          # (NF,3) local param (X/Z, Y/Z, log Z) in ref cam
    Psub: jnp.ndarray       # (NF,3,3) subfilter covariance
    sind: jnp.ndarray       # (NF,) int32 EKF slot or -1
    init_counter: jnp.ndarray    # (NF,) int32
    lifetime: jnp.ndarray        # (NF,) int32
    outlier_counter: jnp.ndarray  # (NF,) float
    xp: jnp.ndarray         # (NF,2) latest pixel measurement
    pred: jnp.ndarray       # (NF,2) predicted pixel
    tri_ok: jnp.ndarray     # (NF,) bool — triangulation succeeded
    adj: jnp.ndarray        # (NF,NG) bool visibility adjacency
    adj_xp: jnp.ndarray     # (NF,NG,2) pixel observation per (feature, group)
    sim_depth: jnp.ndarray  # (NF,) ground-truth depth hint (simulation)
    desc: jnp.ndarray       # (NF,8) uint32 packed BRIEF descriptor
    x_fej: jnp.ndarray      # (NF,3) first-estimate of x (FEJ linearization
                            # point, frozen at EKF admission; used when
                            # cfg.use_fej)

    @property
    def active(self):
        return self.fid >= 0

    @property
    def instate(self):
        return self.sind >= 0


class VIOState(NamedTuple):
    X: MotionState
    cam: jnp.ndarray        # (9,) camera intrinsics estimate
    P: jnp.ndarray          # (D,D) error-state covariance
    features: FeatureTable
    groups: GroupTable
    g2row: jnp.ndarray      # (n_groups,) EKF slot -> group-table row, -1 free
    f2row: jnp.ndarray      # (n_features,) EKF slot -> feature row, -1 free
    gauge_row: jnp.ndarray  # () int32: group-table row of the gauge group, -1
    init_z: jnp.ndarray     # () adaptive initial depth (src/manager.cpp:255)
    last_gyro: jnp.ndarray  # (3,)
    last_accel: jnp.ndarray
    slope_gyro: jnp.ndarray
    slope_accel: jnp.ndarray
    td_applied: jnp.ndarray      # () temporal offset already absorbed into
                                 # the propagation timeline (the scan-mode
                                 # equivalent of the reference's host-side
                                 # ts += td shift, src/estimator.cpp:943-951)
    vision_counter: jnp.ndarray  # () int32
    next_gid: jnp.ndarray        # () int32 — monotonically increasing group id
    next_fid: jnp.ndarray        # () int32 — id source for tracker-made features
    key: jnp.ndarray             # PRNG key (RANSAC / gauge selection)
    # OC-EKF prior chain (use_oc): end-of-propagation PRIOR estimates of
    # the previous frame, anchoring the unobservable-subspace constraint
    # on the next frame's transition (Hesch et al., TRO'13)
    oc_R: jnp.ndarray            # (3,3)
    oc_V: jnp.ndarray            # (3,)
    oc_T: jnp.ndarray            # (3,)
    # tracker outlier-rejection count of the CURRENT frame (homography
    # RANSAC rejects; the reference's Tracker::num_outlier_rejected_,
    # src/tracker.h:47-51, bound in pybind11/pyxivo.cpp:332-398)
    n_tracker_rejected: jnp.ndarray  # () int32


def init_state(cfg: VIOConfig, key=None) -> VIOState:
    """Build the initial VIOState from a config (Estimator ctor parity)."""
    import jax

    dt = jnp.dtype(cfg.dtype)
    d = cfg.dims
    D = d.full

    X = MotionState(
        Rsb=so3.exp(jnp.asarray(cfg.X_Wsb, dt)),
        Tsb=jnp.asarray(cfg.X_Tsb, dt),
        Vsb=jnp.asarray(cfg.X_Vsb, dt),
        bg=jnp.asarray(cfg.X_bg, dt),
        ba=jnp.asarray(cfg.X_ba, dt),
        Rbc=so3.exp(jnp.asarray(cfg.X_Wbc, dt)),
        Tbc=jnp.asarray(cfg.X_Tbc, dt),
        Rsg=so3.exp(jnp.asarray(tuple(cfg.X_Wsg) + (0.0,), dt)),
        td=jnp.asarray(cfg.X_td, dt),
        Cg=jnp.asarray(cfg.Cg, dt).reshape(3, 3),
        Ca=jnp.asarray(cfg.Ca, dt).reshape(3, 3),
    )
    if cfg.imu_tk_convention:
        # imu_tk: a_calib = K (a_raw + bias); ours: a_calib = K a_raw - bias
        # (src/estimator.cpp:219-226)
        X = X._replace(bg=-X.Cg @ X.bg, ba=-X.Ca @ X.ba)

    # initial covariance: config gives std-devs, squared on the diagonal
    # ("P_ *= P_", src/estimator.cpp:302 — semantics: squared stds)
    stds = np.zeros(D)
    stds[layout.WSB:layout.WSB + 3] = cfg.P_Wsb
    stds[layout.TSB:layout.TSB + 3] = cfg.P_Tsb
    stds[layout.VSB:layout.VSB + 3] = cfg.P_Vsb
    stds[layout.BG:layout.BG + 3] = cfg.P_bg
    stds[layout.BA:layout.BA + 3] = cfg.P_ba
    stds[layout.WBC:layout.WBC + 3] = cfg.P_Wbc
    stds[layout.TBC:layout.TBC + 3] = cfg.P_Tbc
    stds[layout.WSG:layout.WSG + 2] = cfg.P_Wsg
    if cfg.online_temporal_calib:
        stds[layout.TD] = cfg.P_td
    if cfg.online_imu_calib:
        stds[layout.CG:layout.CG + 9] = cfg.P_Cg
        stds[layout.CA:layout.CA + 6] = cfg.P_Ca
    if cfg.online_camera_calib:
        dim = cam_mod.MODEL_DIM[cam_mod.MODEL_IDS[cfg.cam_model]]
        stds[layout.CAM:layout.CAM + 2] = np.sqrt(cfg.P_FC[0])
        stds[layout.CAM + 2:layout.CAM + 4] = np.sqrt(cfg.P_FC[1])
        stds[layout.CAM + 4:layout.CAM + dim] = np.sqrt(cfg.P_distortion)
    if cfg.covariance_form == "sqrt":
        # factor representation: P = S S^T, diagonal init factor = stds,
        # plus the intra-frame slack workspace (see filter/sqrt_form.py)
        from .sqrt_form import slack_cols
        P = jnp.asarray(np.pad(np.diag(stds),
                               ((0, 0), (0, slack_cols(d)))), dt)
    else:
        P = jnp.asarray(np.diag(stds ** 2), dt)

    kind, intrin, _ = cam_mod.intrinsics_from_cfg(
        dict(model=cfg.cam_model, rows=int(cfg.cam_params[0]),
             cols=int(cfg.cam_params[1]), fx=cfg.cam_params[2],
             fy=cfg.cam_params[3], cx=cfg.cam_params[4], cy=cfg.cam_params[5],
             **_extra_cam_kw(cfg)), dtype=dt)

    NF, NG = d.nf_rows, d.ng_rows
    feats = FeatureTable(
        fid=jnp.full((NF,), -1, jnp.int32),
        status=jnp.zeros((NF,), jnp.int32),
        track=jnp.zeros((NF,), jnp.int32),
        ref=jnp.full((NF,), -1, jnp.int32),
        x=jnp.zeros((NF, 3), dt),
        Psub=jnp.zeros((NF, 3, 3), dt),
        sind=jnp.full((NF,), -1, jnp.int32),
        init_counter=jnp.zeros((NF,), jnp.int32),
        lifetime=jnp.zeros((NF,), jnp.int32),
        outlier_counter=jnp.zeros((NF,), dt),
        xp=jnp.zeros((NF, 2), dt),
        pred=jnp.full((NF, 2), -1.0, dt),
        tri_ok=jnp.zeros((NF,), bool),
        adj=jnp.zeros((NF, NG), bool),
        adj_xp=jnp.zeros((NF, NG, 2), dt),
        sim_depth=jnp.full((NF,), -1.0, dt),
        desc=jnp.zeros((NF, 8), jnp.uint32),
        x_fej=jnp.zeros((NF, 3), dt),
    )
    groups = GroupTable(
        gid=jnp.full((NG,), -1, jnp.int32),
        Rsb=jnp.tile(jnp.eye(3, dtype=dt), (NG, 1, 1)),
        Tsb=jnp.zeros((NG, 3), dt),
        lifetime=jnp.zeros((NG,), jnp.int32),
        sind=jnp.full((NG,), -1, jnp.int32),
        Rsb_fej=jnp.tile(jnp.eye(3, dtype=dt), (NG, 1, 1)),
        Tsb_fej=jnp.zeros((NG, 3), dt),
        is_clone=jnp.zeros((NG,), bool),
    )

    if key is None:
        key = jax.random.PRNGKey(0)

    return VIOState(
        X=X, cam=intrin, P=P, features=feats, groups=groups,
        g2row=jnp.full((d.n_groups,), -1, jnp.int32),
        f2row=jnp.full((d.n_features,), -1, jnp.int32),
        gauge_row=jnp.asarray(-1, jnp.int32),
        init_z=jnp.asarray(cfg.init_z, dt),
        last_gyro=jnp.zeros(3, dt), last_accel=jnp.zeros(3, dt),
        slope_gyro=jnp.zeros(3, dt), slope_accel=jnp.zeros(3, dt),
        td_applied=jnp.asarray(cfg.X_td, dt),
        vision_counter=jnp.asarray(0, jnp.int32),
        next_gid=jnp.asarray(0, jnp.int32),
        next_fid=jnp.asarray(0, jnp.int32),
        key=key,
        # distinct buffers (shared ones break donation in the runners)
        oc_R=X.Rsb.copy(), oc_V=X.Vsb.copy(), oc_T=X.Tsb.copy(),
        n_tracker_rejected=jnp.asarray(0, jnp.int32),
    )


def _extra_cam_kw(cfg: VIOConfig) -> dict:
    extra = cfg.cam_params[6:]
    m = cfg.cam_model
    if m == "radtan":
        keys = ["p1", "p2", "k1", "k2", "k3"]
    elif m in ("equi", "equidistant"):
        keys = ["k0", "k1", "k2", "k3"]
    elif m == "atan":
        keys = ["w"]
    else:
        keys = []
    return dict(zip(keys, extra))
