"""EstimatorData reload + sigma-bound analysis (the tooling tail of the
saver lattice — reference scripts/estimator_data.py)."""
import json

import numpy as np

from xivo_tpu.eval.estimator_data import BLOCKS, EstimatorData
from xivo_tpu.filter import layout as L


def _fake_dump(path, T=5):
    rng = np.random.default_rng(0)
    frames = []
    for k in range(T):
        P = np.zeros((L.MOTION, L.MOTION))
        np.fill_diagonal(P, 0.01 * (k + 1))
        frames.append(dict(
            ts=0.05 * k,
            Tsb=[0.1 * k, 0.0, 0.0], Wsb=[0, 0, 0],
            Vsb=[2.0, 0.0, 0.0], bg=[0.001] * 3, ba=[0.01] * 3,
            Tbc=[0.05, -0.07, -0.04], Wbc=[0, 0, 0], td=0.001,
            num_instate_features=7, num_instate_groups=3,
            Pstate=P.tolist()))
    with open(path, "w") as f:
        json.dump(frames, f)


def test_estimator_data_reload_and_sigma(tmp_path):
    p = str(tmp_path / "dump.json")
    _fake_dump(p)
    ed = EstimatorData(p)
    assert len(ed) == 5
    assert ed.Tsb.shape == (5, 3)
    assert ed.Pstate.shape == (5, L.MOTION, L.MOTION)
    sig = ed.sigma("Tsb")
    assert sig.shape == (5, 3)
    np.testing.assert_allclose(sig[0], 0.1, rtol=1e-12)
    np.testing.assert_allclose(sig[4], np.sqrt(0.05), rtol=1e-12)
    # every named block has a well-formed sigma view
    for b, (off, k) in BLOCKS.items():
        assert ed.sigma(b).shape == (5, k)

    # consistency scalar: truth = the dumped Tbc -> error 0, within 3σ
    assert ed.within_sigma_fraction("Tbc", [0.05, -0.07, -0.04]) == 1.0
    # a grossly wrong truth fails the bound
    assert ed.within_sigma_fraction("Tbc", [5.0, 5.0, 5.0]) == 0.0


def test_estimator_data_matches_live_dump(tmp_path):
    """StateDumpWriter output round-trips through EstimatorData."""
    import jax.numpy as jnp

    from xivo_tpu.api import Estimator
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.io.savers import StateDumpWriter
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(PCW_CFG, dtype="float64")
    est = Estimator(cfg)
    p = str(tmp_path / "live.json")
    w = StateDumpWriter(p, save_cov=True)
    w.add(0.0, est)
    w.add(0.05, est)
    w.write()
    ed = EstimatorData(p)
    assert len(ed) == 2
    np.testing.assert_allclose(ed.Tsb[0], np.asarray(est.state.X.Tsb))
    # dumped sigma agrees with the live covariance diagonal
    live = np.sqrt(np.diag(est.Pstate())[L.TSB:L.TSB + 3])
    np.testing.assert_allclose(ed.sigma("Tsb")[0], live, rtol=1e-9)


def test_covdump_trackerdump_roundtrip(tmp_path):
    """CovDumpWriter -> EstimatorData round-trip (covariance included)
    and TrackerDumpWriter -> load_tracker_dump (VERDICT r2 #9; ref
    scripts/savers.py:157-313)."""
    import numpy as np
    from xivo_tpu.api import Estimator
    from xivo_tpu.eval.estimator_data import EstimatorData
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.io.savers import (CovDumpWriter, TrackerDumpWriter,
                                    load_tracker_dump)
    from xivo_tpu.sim import RandomPCW, get_imu_sim
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    est = Estimator(cfg)
    imu = get_imu_sim("gentle", T=3.0, noise_accel=0, noise_gyro=0, seed=1)
    pcw = RandomPCW([-10, 10], [-10, 10], [-5, 5], n_points=300, seed=0)
    K = np.array([[275.0, 0, 320], [0, 275, 240], [0, 0, 1]])
    Rbc, Tbc = est.gbc()

    cov_path = str(tmp_path / "covdump.json")
    trk_path = str(tmp_path / "tracker.csv")
    cov = CovDumpWriter(cov_path)
    trk = TrackerDumpWriter(trk_path)
    n_frames = 0
    for t in np.arange(0, 1.2, 0.05):
        for ti in np.arange(t, t + 0.05, 0.01):
            a, g = imu.meas(ti)
            est.InertialMeas(ti, g, a)
        Rsb, Tsb = imu.gsb(t + 0.05)
        ids, xpd = pcw.generate_measurements(
            Rsb @ Rbc, Rsb @ Tbc + Tsb, K, 640, 480, 0.0)
        est.VisualMeasPointCloud(t + 0.05, ids, xpd)
        cov.add(t + 0.05, est)
        trk.add(t + 0.05, est)
        n_frames += 1
    cov.write()

    ed = EstimatorData(cov_path)
    assert len(ed) == n_frames
    # covariance round-trips: the dumped Pstate drives sigma queries
    sig = ed.sigma("Tsb")
    assert sig.shape == (n_frames, 3) and np.isfinite(sig).all()
    np.testing.assert_allclose(ed.Tsb[-1], np.asarray(est.gsb()[1]),
                               atol=1e-9)
    assert (ed.num_instate_features[-5:] > 0).all()

    td = load_tracker_dump(trk_path)
    assert td["desc"].shape[1] == 8
    assert len(np.unique(td["fid"])) > 50
    assert (td["xp"][:, 0] >= 0).all() and (td["xp"][:, 0] < 640).all()
