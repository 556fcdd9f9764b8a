"""Depth-bootstrap accuracy: the no-prior scenario with parallax-gated
admission (an improvement over the reference — see ARCHITECTURE.md).

Without the gate this scenario (far-field world, initial_z=2.5 vs true
depths of ~8-17 m, no ground-truth depth hints) drifts to meter-level
error; with the gate it tracks at centimeter level.
"""
import numpy as np

from xivo_tpu.filter.config import config_from_json
from tests.test_e2e_pcw import PCW_CFG, run_scan


def test_no_prior_bootstrap_with_gated_admission():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=False,
                           propagation_mode="fast",
                           max_depth_var_for_admission=0.01)
    s, outs, gt = run_scan(cfg, total_time=15.0, noise_px=0.5)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.15, rmse
    assert err[-1] < 0.25, err[-1]
    assert int(outs.num_instate_features[-1]) > 20
