"""The three propagation modes must agree on the e2e sim."""
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from tests.test_e2e_pcw import PCW_CFG, run_scan


@pytest.mark.parametrize("mode", ["reference", "fast", "batched"])
def test_mode_accuracy(mode):
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           propagation_mode=mode)
    s, outs, gt = run_scan(cfg, total_time=4.0, noise_px=0.25)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.05, (mode, rmse)
    assert np.isfinite(np.asarray(s.P)).all()


def test_adaptive_prince_dormand():
    """Error-controlled PD45 stepsize (pd_control_stepsize) matches the
    fixed-step accuracy. The reference's control_stepsize exists but its
    embedded error estimate is commented out (src/princedormand.cpp:
    216-221, returns 0) — ours uses the real 4th/5th difference."""
    cfg = config_from_json(
        dict(PCW_CFG, PrinceDormand={"stepsize": 0.002,
                                     "control_stepsize": True,
                                     "tolerance": 1e-4}),
        dtype="float64", sim_initialize_depths=True,
        propagation_mode="reference")
    s, outs, gt = run_scan(cfg, total_time=4.0, noise_px=0.25)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.05, rmse
    assert np.isfinite(np.asarray(s.P)).all()
