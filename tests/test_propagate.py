"""Propagation tests.

1. Motion Jacobian F vs finite differences of the continuous dynamics
   through the error retraction (parity with the scheme of
   src/test/unittest_jacobians_instate.cpp applied to the motion model).
2. Integrator accuracy vs scipy's high-order ODE solver.
3. Covariance stays symmetric and grows under process noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter import layout as L
from xivo_tpu.filter.config import VIOConfig
from xivo_tpu.filter.propagate import (compose_motion, motion_jacobians,
                                       propagate_interval)
from xivo_tpu.filter.retraction import apply_motion_error
from xivo_tpu.filter.state import MotionState
from xivo_tpu.geom import so3

RNG = np.random.default_rng(42)


def random_motion_state(dtype=jnp.float64):
    r = lambda n: jnp.asarray(RNG.standard_normal(n), dtype)
    return MotionState(
        Rsb=so3.exp(r(3)), Tsb=r(3), Vsb=r(3), bg=0.01 * r(3), ba=0.05 * r(3),
        Rbc=so3.exp(r(3)), Tbc=0.1 * r(3), Rsg=so3.exp(jnp.asarray(
            [0.03, -0.02, 0.0], dtype)),
        td=jnp.asarray(0.005, dtype),
        Cg=jnp.eye(3, dtype=dtype) + 0.01 * r((3, 3)),
        Ca=jnp.triu(jnp.eye(3, dtype=dtype) + 0.01 * r((3, 3))),
    )


def dynamics(X: MotionState, gyro, accel, g):
    """Continuous-time derivative of (W-tangent, T, V, ...) at the nominal."""
    gyro_calib = X.Cg @ gyro - X.bg
    accel_calib = X.Ca @ accel - X.ba
    return dict(
        W=gyro_calib,                      # body-frame tangent velocity of Rsb
        T=X.Vsb,
        V=X.Rsb @ accel_calib + X.Rsg @ g,
    )


def test_motion_jacobian_fd():
    X = random_motion_state()
    gyro = jnp.asarray(RNG.standard_normal(3))
    accel = jnp.asarray(RNG.standard_normal(3) * 3)
    g = jnp.asarray([0.0, 0.0, -9.8])
    F, G = motion_jacobians(X, gyro, accel, g, jnp.float64)

    eps = 1e-7

    def fd_column(i):
        d = jnp.zeros(L.MOTION).at[i].set(eps)
        Xp = apply_motion_error(X, d)
        Xm = apply_motion_error(X, -d)
        fp = dynamics(Xp, gyro, accel, g)
        fm = dynamics(Xm, gyro, accel, g)
        dW = (fp["W"] - fm["W"]) / (2 * eps)
        dV = (fp["V"] - fm["V"]) / (2 * eps)
        return dW, dV

    # columns to check: Wsb has no effect on W-dot; bg, Cg affect W-dot;
    # Wsb, ba, Ca, Wsg affect V-dot.
    for i in range(3):
        dW, dV = fd_column(L.BG + i)
        assert np.allclose(F[L.WSB:L.WSB + 3, L.BG + i], dW, atol=1e-5)
    for i in range(9):
        dW, _ = fd_column(L.CG + i)
        assert np.allclose(F[L.WSB:L.WSB + 3, L.CG + i], dW, atol=1e-5)
    for i in range(3):
        _, dV = fd_column(L.BA + i)
        assert np.allclose(F[L.VSB:L.VSB + 3, L.BA + i], dV, atol=1e-5)
    for i in range(6):
        _, dV = fd_column(L.CA + i)
        assert np.allclose(F[L.VSB:L.VSB + 3, L.CA + i], dV, atol=1e-4)
    for i in range(2):
        _, dV = fd_column(L.WSG + i)
        assert np.allclose(F[L.VSB:L.VSB + 3, L.WSG + i], dV, atol=1e-5)
    # dV/dWsb: -Rsb hat(accel_calib) under right-perturbation
    for i in range(3):
        _, dV = fd_column(L.WSB + i)
        assert np.allclose(F[L.VSB:L.VSB + 3, L.WSB + i], dV, atol=1e-5)


@pytest.mark.parametrize("method", ["RK4", "PrinceDormand"])
def test_integrator_vs_scipy(method):
    from scipy.integrate import solve_ivp
    from scipy.spatial.transform import Rotation

    dtype = jnp.float64
    cfg = VIOConfig(dtype="float64", integration_method=method,
                    Qimu_gyro=(0,) * 3, Qimu_accel=(0,) * 3,
                    Qimu_gyro_bias=(0,) * 3, Qimu_accel_bias=(0,) * 3)
    X = random_motion_state(dtype)
    g = np.asarray(cfg.gravity)
    gyro0 = np.array([0.3, -0.2, 0.5])
    accel0 = np.array([1.0, 2.0, 9.0])
    sg = np.array([0.5, 0.1, -0.4])
    sa = np.array([-1.0, 0.5, 0.2])
    dt = 0.005

    m = L.MOTION
    D = 60
    Pmm = jnp.zeros((m, m), dtype)
    Pms = jnp.zeros((m, D - m), dtype)
    Xn, _, _ = propagate_interval(cfg, X, Pmm, Pms, jnp.asarray(gyro0),
                                  jnp.asarray(accel0), jnp.asarray(sg),
                                  jnp.asarray(sa), jnp.asarray(dt))

    Cg, Ca = np.asarray(X.Cg), np.asarray(X.Ca)
    bg, ba = np.asarray(X.bg), np.asarray(X.ba)
    Rsg = np.asarray(X.Rsg)

    def ode(t, y):
        R = y[:9].reshape(3, 3)
        V = y[12:15]
        gyro = gyro0 + sg * t
        accel = accel0 + sa * t
        w = Cg @ gyro - bg
        a = Ca @ accel - ba
        dR = R @ np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]])
        dT = V
        dV = R @ a + Rsg @ g
        return np.concatenate([dR.ravel(), dT, dV])

    y0 = np.concatenate([np.asarray(X.Rsb).ravel(), np.asarray(X.Tsb),
                         np.asarray(X.Vsb)])
    sol = solve_ivp(ode, (0, dt), y0, rtol=1e-12, atol=1e-12)
    yf = sol.y[:, -1]
    Rf = yf[:9].reshape(3, 3)

    # the reference scheme (which we port exactly) integrates V and R with
    # stage-point Euler inside ComposeMotion — O(h^2) locally — while the
    # position gets the full RK weighting, so tolerances differ per block
    assert np.allclose(np.asarray(Xn.Tsb), yf[9:12], atol=1e-7)
    assert np.allclose(np.asarray(Xn.Vsb), yf[12:15], atol=5e-5)
    assert np.allclose(np.asarray(Xn.Rsb), Rf, atol=5e-5)


def test_covariance_symmetric_and_growing():
    cfg = VIOConfig(dtype="float64")
    X = random_motion_state()
    m = L.MOTION
    D = 100
    rng = np.random.default_rng(3)
    A = rng.standard_normal((m, m)) * 0.01
    Pmm0 = jnp.asarray(A @ A.T + 0.01 * np.eye(m))
    Pms0 = jnp.asarray(rng.standard_normal((m, D - m)) * 1e-4)
    Xn, Pmm, Pms = propagate_interval(
        cfg, X, Pmm0, Pms0, jnp.asarray([0.1, 0.2, -0.1]),
        jnp.asarray([0.0, 0.0, 9.8]), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(0.01))
    Pmm = np.asarray(Pmm)
    assert np.allclose(Pmm, Pmm.T, atol=1e-12)
    # process noise must increase total motion uncertainty
    assert np.trace(Pmm) > np.trace(np.asarray(Pmm0))
    # eigenvalues stay positive
    assert np.linalg.eigvalsh(Pmm).min() > 0


def test_zero_dt_noop():
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.filter.propagate import imu_sample_update
    cfg = VIOConfig(dtype="float64")
    s = init_state(cfg)
    s2 = imu_sample_update(cfg, s, jnp.zeros(3), jnp.zeros(3),
                           jnp.asarray(0.0))
    assert np.allclose(s2.P, s.P)
    assert np.allclose(s2.X.Tsb, s.X.Tsb)


def test_clamp_signals():
    """clamp_signals (src/estimator.cpp:488-507): per-axis saturation of
    gyro/accel before they enter the filter. An extreme sample with the
    clamp on must propagate identically to the pre-clamped sample with
    the clamp off."""
    import dataclasses
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.filter.propagate import imu_sample_update
    cfg_on = VIOConfig(dtype="float64", clamp_signals=True,
                       max_gyro=(1.0, 1.0, 1.0), max_accel=(5.0, 5.0, 5.0))
    cfg_off = dataclasses.replace(cfg_on, clamp_signals=False)
    s = init_state(cfg_on)
    wild_g = jnp.asarray([40.0, -0.5, -300.0])
    wild_a = jnp.asarray([100.0, 2.0, -9.8])
    s_on = imu_sample_update(cfg_on, s, wild_g, wild_a, jnp.asarray(0.01))
    s_ref = imu_sample_update(
        cfg_off, s, jnp.asarray([1.0, -0.5, -1.0]),
        jnp.asarray([5.0, 2.0, -5.0]), jnp.asarray(0.01))
    assert np.allclose(s_on.X.Tsb, s_ref.X.Tsb)
    assert np.allclose(s_on.P, s_ref.P)
    # and clamp-off really is different
    s_raw = imu_sample_update(cfg_off, s, wild_g, wild_a, jnp.asarray(0.01))
    assert not np.allclose(s_raw.X.Vsb, s_ref.X.Vsb)
