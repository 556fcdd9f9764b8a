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


def test_associate_tum_global_best_pairs():
    """The TUM protocol sorts ALL candidate pairs by |dt| and takes
    global best matches (tum_rgbd_benchmark_tools/associate.py:76-105).
    Fixture where first-come nearest-neighbor matching disagrees: est[0]
    is closer to gt[1] than to gt[0], but est[1] is even closer to gt[1]
    — global matching gives gt[1] to est[1] and gt[0] to est[0]; greedy
    first-come would let est[0] steal gt[1] and push est[1] out of its
    best pair.
    """
    from xivo_tpu.eval.metrics import associate
    t_gt = np.array([0.000, 0.010])
    t_est = np.array([0.006, 0.0095])
    pairs = associate(t_est, t_gt, max_difference=0.008)
    # greedy-first-come would produce [(0, 1)] and leave est[1] matched
    # to nothing (gt[0] is 0.0095 away — outside the window)
    assert pairs == [(0, 0), (1, 1)]


def test_associate_strict_window_and_no_reuse():
    from xivo_tpu.eval.metrics import associate
    t_gt = np.array([0.0, 1.0, 2.0])
    # exactly at the window boundary: STRICT < excludes it (reference
    # uses < max_difference)
    assert associate(np.array([0.5]), t_gt, max_difference=0.5) == []
    # two estimates competing for one GT stamp: closer wins, no reuse
    pairs = associate(np.array([0.99, 1.002]), t_gt, max_difference=0.05)
    assert pairs == [(1, 1)]
