"""End-to-end IMAGE-mode VIO: FAST + LK + EKF on rendered frames.

The full TUM-VI-shaped path (config 1/3 of BASELINE) exercised on
synthetic imagery with exact ground truth: images in, trajectory out.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.frontend import init_frontend, vio_frame_image, \
    tracker_only_frame
from xivo_tpu.sim import get_imu_sim
from xivo_tpu.sim.render import render_dots
from xivo_tpu.sim.configs import IMG_CFG, make_world  # noqa: F401

pytestmark = pytest.mark.slow  # heavy tier: XIVO_SLOW=1 runs these


@pytest.fixture(scope="module")
def image_run():
    cfg = config_from_json(IMG_CFG, dtype="float64")
    imu = get_imu_sim("gentle", T=7.0, noise_accel=1e-4, noise_gyro=1e-5,
                      seed=1)
    Xs = make_world()
    K = np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]])
    from xivo_tpu.geom import so3
    Rbc = np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(cfg.X_Tbc)

    s = init_state(cfg)
    a0, g0 = imu.meas(0.0)
    s = s._replace(last_gyro=jnp.asarray(g0, np.float64),
                   last_accel=jnp.asarray(a0, np.float64))
    fes = init_frontend(cfg)
    from functools import partial
    step = jax.jit(partial(vio_frame_image, cfg), donate_argnums=(0, 1))

    imu_dt, vis_dt = 0.01, 0.05
    T_total = 6.0
    KI = 8
    t_prev = 0.0
    errs = []
    track_counts = []
    t = vis_dt
    outs = None
    while t < T_total:
        gys = np.zeros((KI, 3))
        acs = np.zeros((KI, 3))
        dts = np.zeros((KI,))
        i = 0
        ti = t_prev + imu_dt
        while ti <= t + 1e-9 and i < KI:
            a, g = imu.meas(ti)
            gys[i], acs[i], dts[i] = g, a, imu_dt
            ti += imu_dt
            i += 1
        frame_dt = t - (t_prev + imu_dt * i) + imu_dt * 0  # remainder
        frame_dt = max(t - t_prev - imu_dt * i, 0.0)
        Rsb, Tsb = imu.gsb(t)
        Rsc = Rsb @ Rbc
        Tsc = Rsb @ Tbc + Tsb
        img = render_dots(Xs, Rsc, Tsc, K, 320, 240)
        s, fes, outs = step(s, fes, jnp.asarray(gys), jnp.asarray(acs),
                            jnp.asarray(dts), jnp.asarray(frame_dt),
                            jnp.asarray(img))
        errs.append(np.linalg.norm(np.asarray(s.X.Tsb) - Tsb))
        track_counts.append(int(outs.num_tracked))
        t_prev = t
        t += vis_dt
    return cfg, np.asarray(errs), np.asarray(track_counts), s


def test_tracker_maintains_tracks(image_run):
    cfg, errs, counts, s = image_run
    # after warmup the tracker holds a healthy population
    assert counts[10:].min() >= 20, counts
    assert counts.max() <= cfg.num_features_max + 5


def test_image_vio_bounded_error(image_run):
    cfg, errs, counts, s = image_run
    assert np.isfinite(np.asarray(s.P)).all()
    # dot-rendered world, LK tracking, unknown depths: the filter stays
    # stable and meter-scale over 6 s. (Tightening this bound is the
    # depth-bootstrap workstream — same limitation as the point-cloud
    # path without sim depths; see .claude/skills/verify/SKILL.md.)
    assert errs[-1] < 5.0, errs[-1]
    assert np.median(errs) < 3.0
