"""Long-horizon float32 stability: the production dtype over 30 s with
persistent visibility (orbit motion). Guards against covariance decay /
drift accumulation in f32."""
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def test_30s_float32_orbit():
    cfg_json = dict(PCW_CFG)
    cfg_json["X"] = {**PCW_CFG["X"], "Vsb": [0.9, 0.0, 0.45]}
    cfg = config_from_json(cfg_json, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast")
    fi, gt = build_pcw_stream(cfg, total_time=30.0, noise_px=0.5,
                              motion="orbit")
    assert int(np.asarray(fi.meas_valid).sum(axis=1).min()) > 50
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], np.float32),
                   last_accel=jnp.asarray(gt["accel0"], np.float32))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.06, rmse
    assert err[-1] < 0.1
    P = np.asarray(s.P)
    assert np.isfinite(P).all()


@pytest.mark.slow
def test_30s_traversing_trajectory_tube_world():
    """Long-horizon stability on a TRAVERSING trajectory (tens of
    meters). With a box-uniform world the camera sweeps feature-free
    directions and the run starves (measured: visibility hits zero and
    error diverges to ~15 m); the tube world (sim/pcw.py::TubePCW)
    sustains visibility, and the filter holds sub-meter error over
    30 s of calib_rich motion."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=30.0, noise_px=0.25,
                              motion="calib_rich", world="tube")
    assert int(np.asarray(fi.meas_valid).sum(axis=1).min()) > 5
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    assert float(np.sqrt(np.mean(err ** 2))) < 0.8
    assert int(outs.num_instate_features[-1]) > 10
