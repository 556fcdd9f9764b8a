"""ATE/RPE metric tests against constructed transformations."""
import numpy as np

from xivo_tpu.eval import ate_rmse, horn_align, rpe
from xivo_tpu.geom import so3
import jax.numpy as jnp


def make_traj(n=100):
    t = np.linspace(0, 10, n)
    T = np.stack([np.sin(t), np.cos(0.5 * t), 0.1 * t], axis=1)
    R = np.stack([np.asarray(so3.exp(jnp.asarray([0.02 * ti, 0.01 * ti, 0])))
                  for ti in t])
    return t, R, T


def test_horn_alignment_exact():
    t, R, T = make_traj()
    Rg = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.5])))
    tg = np.array([1.0, -2.0, 3.0])
    T2 = T @ Rg.T + tg
    Ra, ta = horn_align(T, T2)
    assert np.allclose(Ra, Rg, atol=1e-10)
    assert np.allclose(ta, tg, atol=1e-10)


def test_ate_zero_for_rigidly_moved_traj():
    t, R, T = make_traj()
    Rg = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.5])))
    T2 = T @ Rg.T + np.array([5.0, 1.0, -2.0])
    rmse, n, e = ate_rmse(t, T2, t, T)
    assert n == len(t)
    assert rmse < 1e-10


def test_ate_known_noise():
    t, R, T = make_traj()
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(T.shape) * 0.01
    rmse, n, _ = ate_rmse(t, T + noise, t, T)
    assert 0.005 < rmse < 0.02


def test_rpe_zero_for_identical():
    t, R, T = make_traj()
    tr, rot, n = rpe(t, R, T, t, R, T, delta=1.0)
    assert n > 0
    assert tr < 1e-10
    # arccos has sqrt-of-eps precision near identity
    assert rot < 1e-4


def test_rpe_detects_drift():
    t, R, T = make_traj()
    # constant velocity drift: 0.1 m/s -> RPE@1s = 0.1 m
    T2 = T + np.outer(t, np.array([0.1, 0, 0]))
    tr, rot, n = rpe(t, R, T2, t, R, T, delta=1.0)
    assert abs(tr - 0.1) < 0.02
