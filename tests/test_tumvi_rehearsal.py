"""TUM-VI full-dress rehearsal (short form).

The BASELINE accuracy targets are TUM-VI room1-6 runs that cannot be
executed here (no dataset bytes); this is the de-risking rehearsal:
the COMPLETE TUM-VI configuration — 512x512 EQUIDISTANT lens with the
real cam0 distortion, Wbc given as a rotation matrix, gravity init
from rest, prediction-seeded LK, descriptor rescue of dropped tracks,
homography outlier rejection — driven through the streaming Estimator
API on textured renders (sim/texture.py) with exact ground truth.
Long-form (>=60 s, ATE protocol) lives in
scripts/run_tumvi_rehearsal.py.

Parity anchors: cfg/tumvi_cam0.json (config surface),
src/tracker.cpp:463-629 (LK regime), src/estimator.cpp:439-473
(gravity init).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu import cam as cam_mod
from xivo_tpu.api import Estimator
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.geom import so3
from xivo_tpu.sim import get_imu_sim
from xivo_tpu.sim.texture import TexturedBoxWorld

pytestmark = pytest.mark.slow  # heavy tier: XIVO_SLOW=1 runs these

# the TUM-VI cam0 geometry (cfg/tumvi_cam0.json:183-195) with the
# shipped tracker regime (FAST+BRIEF LK, prediction, rescue,
# homography RANSAC — :213-260)
TUMVI_CFG = {
    "simulation": False,
    "integration_method": "PrinceDormand",
    "PrinceDormand": {"stepsize": 0.002},
    "imu_rate": 200.0,
    "gravity": [0, 0, -9.8],
    "gravity_init_counter": 20,
    "X": {
        "Wsb": [0, 0, 0], "Tsb": [0, 0, 0], "Vsb": [0, 0, 0],
        "bg": [0, 0, 0], "ba": [0, 0, 0],
        # rotation MATRIX form, like the reference config
        "Wbc": np.asarray(so3.exp(jnp.asarray(
            [-1.2, 1.2, -1.2]))).tolist(),
        "Tbc": [0.045, -0.071, -0.045],
        "Wsg": [0, 0], "td": 0.0,
    },
    "P": {"Wsb": 0.001, "Tsb": 0.001, "Vsb": 0.2, "bg": 1e-4, "ba": 1e-3,
          "Wbc": 0.0001, "Tbc": 0.001, "Wsg": 0.01, "td": 1e-5},
    "Qmodel": {"Wsb": 0.0, "Wbc": 0, "Wsg": 0},
    "Qimu": {"gyro": [4e-3] * 3, "gyro_bias": [1e-5] * 3,
             "accel": [2e-2] * 3, "accel_bias": [1e-4] * 3},
    "initial_z": 3.0, "initial_std_x": 1.0, "initial_std_y": 1.0,
    "initial_std_z": 1.5,
    "max_depth": 20.0, "min_depth": 0.2,
    "visual_meas_std": 1.5,
    "subfilter": {"visual_meas_std": 3.5, "ready_steps": 2,
                  "MH_thresh": 8.991},
    "min_inliers": 5, "MH_thresh": 8.991, "MH_adjust_factor": 1.15,
    "num_gauge_xy_features": 3,
    "max_group_lifetime": 60,
    "group_degrees_fixed": 6,
    "max_depth_var_for_admission": 0.02,
    "camera_cfg": {
        "model": "equidistant", "rows": 512, "cols": 512,
        "fx": 190.97847715128717, "fy": 190.9733070521226,
        "cx": 254.93170605935475, "cy": 256.8974428996504,
        "k0123": [0.0034823894022493434, 0.0007150348452162257,
                  -0.0020532361418706202, 0.00020293673591811182],
    },
    "tracker_cfg": {
        "tracker_type": "LK", "detector": "FAST",
        "num_features_min": 45, "num_features_max": 60,
        "max_pixel_displacement": 64, "mask_size": 15, "margin": 8,
        "use_prediction": True, "extract_descriptor": True,
        "descriptor": "brief", "descriptor_distance_thresh": 64,
        "match_dropped_tracks": True,
        "do_outlier_rejection": True,
        "outlier_rejection": {"RANSAC_reproj_thresh": 3.0},
        "KLT": {"win_size": 15, "max_level": 4, "max_iter": 15,
                "eps": 0.01},
        "FAST": {"threshold": 12.0},
    },
}


def run_rehearsal(total_time=3.0, dtype="float64", rest_time=0.6,
                  vis_dt=0.05, imu_dt=0.005, seed=0, **overrides):
    """Stream a textured-render TUM-VI sequence through the API.

    Returns (est, errs (F,), counts (F,), gt_T (F,3))."""
    cfg = config_from_json(TUMVI_CFG, dtype=dtype, **overrides)
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    _, intrin, _ = cam_mod.intrinsics_from_cfg(
        dict(model="equidistant", rows=512, cols=512,
             fx=cfg.cam_params[2], fy=cfg.cam_params[3],
             cx=cfg.cam_params[4], cy=cfg.cam_params[5],
             k0=cfg.cam_params[6], k1=cfg.cam_params[7],
             k2=cfg.cam_params[8], k3=cfg.cam_params[9]),
        dtype=jnp.float64)

    imu = get_imu_sim("tumvi_room", T=total_time + 1.0, rest_time=rest_time,
                      noise_accel=2e-3, noise_gyro=2e-4, seed=seed)
    world = TexturedBoxWorld(kind, np.asarray(intrin), 512, 512,
                             half_extents=(4.0, 4.0, 2.5),
                             texture_scale=4.0, octaves=5, seed=seed)
    Rbc = np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(cfg.X_Tbc)

    est = Estimator(cfg)
    rng = np.random.default_rng(seed)

    errs, counts, gts, ests, times = [], [], [], [], []
    t = 0.0
    next_vis = rest_time + vis_dt
    n_steps = int(round(total_time / imu_dt))
    for k in range(1, n_steps + 1):
        t = k * imu_dt
        a, g = imu.meas(t)
        est.InertialMeas(t, g, a)
        if t + 1e-9 >= next_vis:
            Rsb, Tsb = imu.gsb(next_vis)
            Rsc = Rsb @ Rbc
            Tsc = Rsb @ Tbc + Tsb
            img = world.render(Rsc, Tsc,
                               exposure=1.0 + 0.05 * np.sin(3.0 * t),
                               blur_px=0.6, noise_std=2.0, rng=rng)
            est.VisualMeas(next_vis, img)
            if est.vision_initialized:
                Te = np.asarray(est.state.X.Tsb)
                errs.append(np.linalg.norm(Te - Tsb))
                counts.append(est.num_tracked_features())
                gts.append(Tsb)
                ests.append(Te)
                times.append(next_vis)
            next_vis += vis_dt
    return est, np.asarray(errs), np.asarray(counts), np.asarray(gts), \
        np.asarray(times), np.asarray(ests)


@pytest.fixture(scope="module")
def rehearsal():
    return run_rehearsal(total_time=3.0)


def test_gravity_initialized_from_rest(rehearsal):
    est = rehearsal[0]
    assert est.gravity_initialized
    # Rsg rotates gravity into the spatial frame; with a level start it
    # should be near identity (z-yaw zeroed by construction)
    Rsg = np.asarray(est.state.X.Rsg)
    assert np.linalg.norm(Rsg - np.eye(3)) < 0.1


def test_tracker_regime(rehearsal):
    est, errs, counts = rehearsal[0], rehearsal[1], rehearsal[2]
    # the full LK/FAST/BRIEF stack holds a healthy population on
    # TEXTURED imagery through the equidistant lens
    assert counts[5:].min() >= 20, counts
    assert counts.max() <= est.cfg.num_features_max + 5


def test_bounded_error_equidistant(rehearsal):
    est, errs = rehearsal[0], rehearsal[1]
    P = est.P()
    assert np.isfinite(P).all()
    assert errs[-1] < 0.6, errs
    assert np.median(errs) < 0.3, errs
    assert est.num_instate_features() > 0
