"""Hand-eye / alignment / Allan-variance utility tests."""
import jax.numpy as jnp
import numpy as np

from xivo_tpu.eval.geometry import (allan_deviation, hand_eye_rotation,
                                    identify_noise_densities,
                                    trajectory_alignment)
from xivo_tpu.geom import so3


def test_hand_eye_rotation():
    rng = np.random.default_rng(0)
    R_true = np.asarray(so3.exp(jnp.asarray([0.4, -0.3, 0.8])))
    A, B = [], []
    for _ in range(20):
        b = rng.standard_normal(3)
        a = R_true @ b
        A.append(a)
        B.append(b)
    R = hand_eye_rotation(A, B)
    assert np.allclose(R, R_true, atol=1e-8)


def test_trajectory_alignment():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 10, 200)
    X = np.stack([np.sin(t), np.cos(0.7 * t), 0.2 * t], axis=1)
    R_true = np.asarray(so3.exp(jnp.asarray([0.2, 0.5, -0.1])))
    T_true = np.array([3.0, -1.0, 2.0])
    Y = X @ R_true.T + T_true
    R, T = trajectory_alignment(Y, X)
    assert np.allclose(R, R_true, atol=1e-8)
    assert np.allclose(T, T_true, atol=1e-8)


def test_allan_white_noise_slope():
    rng = np.random.default_rng(2)
    fs = 200.0
    sigma = 0.02   # white noise density sigma/sqrt(Hz)... discrete std
    n = 200_000
    w = rng.standard_normal(n) * sigma
    taus, adev = allan_deviation(w, fs)
    # white noise: adev(tau) = sigma_d / sqrt(fs * tau) -> slope -1/2
    i1 = np.argmin(np.abs(taus - 0.1))
    i2 = np.argmin(np.abs(taus - 1.0))
    slope = (np.log(adev[i2]) - np.log(adev[i1])) \
        / (np.log(taus[i2]) - np.log(taus[i1]))
    assert -0.6 < slope < -0.4, slope
    # density at tau=1s ~= sigma / sqrt(fs)
    expected = sigma / np.sqrt(fs)
    assert 0.5 * expected < adev[i2] < 2.0 * expected


def test_identify_noise_densities():
    rng = np.random.default_rng(3)
    fs = 100.0
    gyro = rng.standard_normal((100_000, 3)) * 0.01
    accel = rng.standard_normal((100_000, 3)) * 0.05
    out = identify_noise_densities(gyro, accel, fs)
    assert np.all(out["gyro_noise_density"]
                  < out["accel_noise_density"])
