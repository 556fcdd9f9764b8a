"""Long-horizon float32 stability: the production dtype over 30 s with
persistent visibility (orbit motion). Guards against covariance decay /
drift accumulation in f32."""
import jax.numpy as jnp
import numpy as np

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
