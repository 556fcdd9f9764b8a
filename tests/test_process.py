"""EstimatorProcess (async worker + publishers) test."""
import numpy as np
import pytest

from xivo_tpu.api import Estimator
from xivo_tpu.api.process import EstimatorProcess
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.sim import RandomPCW, get_imu_sim
from tests.test_e2e_pcw import PCW_CFG


@pytest.mark.slow
def test_async_process_matches_sync():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    imu = get_imu_sim("gentle", T=2.0, noise_accel=0, noise_gyro=0,
                      seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])

    def feed(target):
        Rbc, Tbc = target.est.gbc() if isinstance(
            target, EstimatorProcess) else target.gbc()
        pcw_local = RandomPCW([-10, 10], [-10, 10], [-5, 5],
                              n_points=300, seed=0)
        packets = sorted([(t, 0) for t in np.arange(0, 1.5, 0.01)]
                         + [(t, 1) for t in np.arange(0, 1.5, 0.05)])
        for (t, kind) in packets:
            if kind == 0:
                a, g = imu_local.meas(t)
                target.InertialMeas(t, g, a)
            else:
                Rsb, Tsb = imu_local.gsb(t)
                ids, xpd = pcw_local.generate_measurements(
                    Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 640, 480, 0.0)
                target.VisualMeasPointCloud(t, ids, xpd)

    # sync reference
    imu_local = get_imu_sim("gentle", T=2.0, noise_accel=0,
                            noise_gyro=0, seed=1)
    est_sync = Estimator(cfg)
    est_sync.InitWithSimDepths()
    feed(est_sync)
    T_sync = est_sync.gsb()[1]

    # async
    imu_local = get_imu_sim("gentle", T=2.0, noise_accel=0,
                            noise_gyro=0, seed=1)
    est = Estimator(cfg)
    est.InitWithSimDepths()
    proc = EstimatorProcess(est)
    poses = []
    navs = []
    proc.pose_callbacks.append(
        lambda ts, R, T, P: poses.append((ts, T.copy())))
    proc.nav2d_callbacks.append(
        lambda ts, x, y, yaw: navs.append((ts, x, y, yaw)))
    proc.Start()
    feed(proc)
    proc.Wait()
    proc.Stop()

    assert len(poses) == 30            # one publish per visual frame
    assert len(navs) == 30             # Publish2dNavState parity
    assert np.allclose(est.gsb()[1], T_sync, atol=1e-12)
    # nav2d state matches the published pose
    assert np.allclose([navs[-1][1], navs[-1][2]], poses[-1][1][:2])
