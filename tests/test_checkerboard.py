"""Close-range checkerboard scenario (the reference's own PCW eval world:
cfg/pcw.json initial_z=0.25 + Checkerboard, run_and_eval_pyxivo_pcw.py).

Near-field geometry, few landmarks (7x6 grid), cm-scale motion — a very
different operating point from the far-field random world.
"""
import jax.numpy as jnp
import numpy as np

import xivo_tpu.sim.stream as stream_mod
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim import Checkerboard
from xivo_tpu.sim.imu_sim import IMUSim
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def test_checkerboard_close_range():
    cfg_json = dict(PCW_CFG)
    cfg_json["initial_z"] = 0.25
    cfg_json["min_depth"] = 0.01
    cfg = config_from_json(cfg_json, dtype="float64",
                           propagation_mode="fast")
    world = Checkerboard(square_width=0.05, dim_squares=(7, 6),
                         bot_right_coord=(-0.175, 0.25, -0.15),
                         plane="xz")

    def accel_s(t):
        return np.array([0.02 * np.sin(1.2 * t), -0.025 * np.sin(0.9 * t),
                         0.015 * np.sin(1.5 * t)])

    def gyro(t):
        return np.array([0.08 * np.sin(0.7 * t), 0.06 * np.sin(0.9 * t),
                         0.05 * np.sin(0.5 * t)])

    imu = IMUSim(accel_s, gyro, T=13.0, noise_accel=1e-4,
                 noise_gyro=1e-5, seed=1)
    orig = stream_mod.get_imu_sim
    stream_mod.get_imu_sim = lambda *a, **k: imu
    try:
        fi, gt = build_pcw_stream(cfg, total_time=12.0, noise_px=0.5,
                                  world=world)
    finally:
        stream_mod.get_imu_sim = orig

    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    # centimeter-scale tracking at 0.25 m range with 56 landmarks
    assert rmse < 0.10, rmse
    assert int(outs.num_tracked[-1]) > 30
    assert np.isfinite(np.asarray(s.P)).all()
