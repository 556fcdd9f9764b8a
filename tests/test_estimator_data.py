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
