"""Full VIO through non-pinhole camera models (TUM-VI uses equidistant).

The simulator projects through the SAME distortion model the filter
uses (use_cfg_camera), exercising project/unproject/Jacobians of each
model inside the complete pipeline.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

CAMS = {
    "equidistant": {"model": "equidistant", "rows": 512, "cols": 512,
                    "fx": 190.97, "fy": 190.9, "cx": 254.93, "cy": 256.9,
                    "k0": 0.0034, "k1": 0.0007, "k2": -0.0046,
                    "k3": 0.0014},
    "radtan": {"model": "radtan", "rows": 480, "cols": 640, "fx": 275.0,
               "fy": 274.0, "cx": 319.5, "cy": 239.5, "p1": 0.0007,
               "p2": -0.0008, "k1": -0.28, "k2": 0.07, "k3": -0.005},
}


@pytest.mark.parametrize("cam", list(CAMS))
def test_full_vio_through_model(cam):
    cfg_json = dict(PCW_CFG)
    cfg_json["camera_cfg"] = CAMS[cam]
    cfg = config_from_json(cfg_json, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=5.0, noise_px=0.25,
                              use_cfg_camera=True)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.08, (cam, rmse)
    assert np.isfinite(np.asarray(s.P)).all()
