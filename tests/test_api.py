"""API-surface tests: the pyxivo method contract + checkpoint/resume +
visualization hooks."""
import os

import jax.numpy as jnp
import numpy as np

from xivo_tpu.api import Estimator
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.sim import RandomPCW, get_imu_sim
from tests.test_e2e_pcw import PCW_CFG

PYXIVO_METHODS = [
    "InertialMeas", "VisualMeas", "VisualMeasTrackerOnly",
    "VisualMeasPointCloud", "VisualMeasPointCloudTrackerOnly", "CloseLoop",
    "InitWithSimDepths", "ScaleInitVelocity", "gbc", "gsb", "gsc", "Vsb",
    "Pstate", "P", "bg", "ba", "Rg", "td", "Ca", "Cg",
    "InstateFeaturePositions", "InstateFeatureCovs", "InstateFeatureIDs",
    "InstateFeatureSinds", "InstateFeatureRefGroups", "InstateFeatureXc",
    "InstateFeaturexc", "InstateFeaturePreds", "InstateFeatureMeas",
    "InstateGroupIDs", "InstateGroupSinds", "InstateGroupPoses",
    "InstateGroupCovs", "num_instate_features", "num_instate_groups",
    "num_mh_rejected", "num_oneptransac_rejected",
    "num_tracker_outlier_rejected", "num_tracker_failed_to_track",
    "num_tracker_new_detections", "UsingLoopClosure", "VisionInitialized",
    "now", "Visualize", "gauge_group", "CameraIntrinsics",
    "CameraDistortionType", "MeasurementUpdateInitialized",
    "JustDroppedFeatureIDs", "tracked_features",
    "tracked_features_no_descriptor",
]


def run_short(est, T=2.0):
    imu = get_imu_sim("gentle", T=T + 1, noise_accel=0, noise_gyro=0,
                      seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()
    packets = sorted([(t, 0) for t in np.arange(0, T, 0.01)]
                     + [(t, 1) for t in np.arange(0, T, 0.05)])
    for (t, kind) in packets:
        if kind == 0:
            a, g = imu.meas(t)
            est.InertialMeas(t, g, a)
        else:
            Rsb, Tsb = imu.gsb(t)
            ids, xpd = pcw.generate_measurements(
                Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 640, 480, 0.0)
            est.VisualMeasPointCloud(t, ids, xpd)
    return imu


def test_pyxivo_method_surface():
    cfg = config_from_json(PCW_CFG, dtype="float64")
    est = Estimator(cfg)
    missing = [m for m in PYXIVO_METHODS if not hasattr(est, m)]
    assert not missing, missing


def test_accessors_consistent(tmp_path):
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    est = Estimator(cfg)
    run_short(est)
    n = est.num_instate_features()
    assert n > 0
    assert len(est.InstateFeatureIDs()) == n
    assert est.InstateFeatureCovs().shape == (n, 3, 3)
    assert est.InstateFeaturexc().shape == (n, 3)
    Xc = est.InstateFeatureXc()
    assert (Xc[:, 2] > 0).all()
    ng = est.num_instate_groups()
    assert len(est.InstateGroupIDs()) == ng
    assert est.InstateGroupCovs().shape == (ng, 6, 6)
    assert est.gauge_group() >= 0
    assert est.CameraDistortionType() == "pinhole"
    fid, xp, desc = est.tracked_features()
    assert len(fid) == len(xp) == len(desc)
    # visualization + graph dump produce files
    p1 = est.Visualize(str(tmp_path / "canvas.png"))
    assert os.path.exists(p1)
    from xivo_tpu.viz import write_graphviz
    p2 = write_graphviz(est, str(tmp_path / "graph.dot"))
    assert "graph vio" in open(p2).read()


def test_tracker_only_mode():
    cfg = config_from_json(PCW_CFG, dtype="float64")
    est = Estimator(cfg)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()
    for i, t in enumerate(np.arange(0, 0.5, 0.05)):
        ids, xpd = pcw.generate_measurements(Rbc, Tbc, K, 640, 480, 0.0)
        est.VisualMeasPointCloudTrackerOnly(t, ids, xpd)
    fid, xp = est.tracked_features_no_descriptor()
    assert len(fid) > 50
    # the filter never ran
    assert est.num_instate_features() == 0
    assert np.allclose(est.gsb()[1], 0.0)


def test_checkpoint_resume(tmp_path):
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    est = Estimator(cfg)
    run_short(est, T=1.5)
    ck = str(tmp_path / "ck.pkl")
    est.save_checkpoint(ck)
    T1 = est.gsb()[1]

    est2 = Estimator(cfg)
    est2.load_checkpoint(ck)
    assert np.allclose(est2.gsb()[1], T1)
    assert est2.vision_initialized
    # both continue identically for a few more frames
    imu = get_imu_sim("gentle", T=3.0, noise_accel=0, noise_gyro=0, seed=1)
    pcw1 = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    # advance both with the same measurements
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()
    for t in [1.55, 1.6]:
        a, g = imu.meas(t)
        est.InertialMeas(t, g, a)
        est2.InertialMeas(t, g, a)
    Rsb, Tsb = imu.gsb(1.65)
    ids, xpd = pcw1.generate_measurements(Rsb @ Rbc, Rsb @ Tbc + Tsb, K,
                                          640, 480, 0.0)
    est.VisualMeasPointCloud(1.65, ids, xpd)
    est2.VisualMeasPointCloud(1.65, ids, xpd)
    assert np.allclose(est.gsb()[1], est2.gsb()[1], atol=1e-12)


def _feed_stream(est, packets, imu, pcw, K, Rbc, Tbc):
    for (t, kind) in packets:
        if kind == 0:
            a, g = imu.meas(t)
            est.InertialMeas(t, g, a)
        else:
            Rsb, Tsb = imu.gsb(t)
            ids, xpd = pcw.generate_measurements(
                Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 640, 480, 0.0)
            est.VisualMeasPointCloud(t, ids, xpd)
    est.flush()


def test_message_reordering_bit_identical():
    """Out-of-order delivery within the buffer window must reproduce the
    in-order trajectory EXACTLY (min-heap drain semantics of
    Estimator::MaintainBuffer, src/estimator.cpp:923-941)."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           message_buffer_size=10)
    imu = get_imu_sim("gentle", T=3.0, noise_accel=0, noise_gyro=0, seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    T = 2.0
    # visual stream offset from the IMU grid: co-timed messages have no
    # defined relative order through a timestamp heap (the reference's
    # heap cmp is ts-only too), so equality there is arrival-order luck
    packets = sorted([(t, 0) for t in np.arange(0, T, 0.01)]
                     + [(t + 0.003, 1) for t in np.arange(0, T, 0.05)])

    est_ord = Estimator(cfg)
    Rbc, Tbc = est_ord.gbc()
    _feed_stream(est_ord, packets, imu, pcw, K, Rbc, Tbc)

    # shuffle within a window smaller than the buffer: every group of 8
    # consecutive packets is delivered in reverse
    shuffled = []
    for i in range(0, len(packets), 8):
        shuffled.extend(reversed(packets[i:i + 8]))
    assert shuffled != packets
    est_shuf = Estimator(cfg)
    _feed_stream(est_shuf, shuffled, imu, pcw, K, Rbc, Tbc)

    assert est_shuf.num_misordered_dropped() == 0
    np.testing.assert_array_equal(np.asarray(est_ord.gsb()[1]),
                                  np.asarray(est_shuf.gsb()[1]))
    np.testing.assert_array_equal(np.asarray(est_ord.gsb()[0]),
                                  np.asarray(est_shuf.gsb()[0]))
    np.testing.assert_array_equal(est_ord.Vsb(), est_shuf.Vsb())
    assert est_ord.num_instate_features() == est_shuf.num_instate_features()


def test_message_reordering_drops_stragglers():
    """A message delayed beyond the buffer window is dropped (GoodTimestamp,
    src/estimator.cpp:1108-1110) and counted, not executed backwards."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           message_buffer_size=5)
    imu = get_imu_sim("gentle", T=3.0, noise_accel=0, noise_gyro=0, seed=1)
    est = Estimator(cfg)
    times = list(np.arange(0, 1.0, 0.01))
    # move one early sample to the very end: by then the clock has
    # advanced far past it
    straggler = times.pop(10)
    for t in times:
        a, g = imu.meas(t)
        est.InertialMeas(t, g, a)
    a, g = imu.meas(straggler)
    est.InertialMeas(straggler, g, a)
    est.flush()
    assert est.num_misordered_dropped() == 1


def test_rejection_counters_wired():
    """num_tracker_outlier_rejected / num_oneptransac_rejected report
    real per-frame counts (VERDICT r2 #9; Tracker counters
    src/tracker.h:47-51, pyxivo.cpp:332-398)."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           do_outlier_rejection=True,
                           use_1pt_RANSAC=True)
    est = Estimator(cfg)
    imu = get_imu_sim("gentle", T=3.0, noise_accel=0, noise_gyro=0, seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()
    rng = np.random.default_rng(7)
    total_trk = 0
    for i, t in enumerate(np.arange(0, 1.5, 0.05)):
        for ti in np.arange(t, t + 0.05, 0.01):
            a, g = imu.meas(ti)
            est.InertialMeas(ti, g, a)
        Rsb, Tsb = imu.gsb(t + 0.05)
        ids, xpd = pcw.generate_measurements(
            Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 640, 480, 0.0)
        if i >= 5 and len(xpd) > 20:
            # corrupt a handful of tracked pixels hard: the homography
            # gate must reject them
            xpd = np.array(xpd, float)
            xpd[:8, :2] += rng.uniform(60, 90, size=(8, 2))
        est.VisualMeasPointCloud(t + 0.05, ids, xpd)
        assert est.num_tracker_outlier_rejected() >= 0
        assert est.num_oneptransac_rejected() >= 0
        total_trk += est.num_tracker_outlier_rejected()
    assert total_trk > 0, "corrupted tracks never counted as rejected"
