"""SO3/SE3 calculus tests: round trips, known values, FD cross-checks.

Parity targets: common/rodrigues.h (hat/exp/log/dAB helpers) and Sophus
usage throughout the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.geom import so3, se3


RNG = np.random.default_rng(0)


def rand_w(scale=1.0):
    return jnp.asarray(RNG.standard_normal(3) * scale)


def test_hat_vee():
    w = rand_w()
    W = so3.hat(w)
    assert np.allclose(W, -W.T)
    assert np.allclose(so3.vee(W), w)
    v = rand_w()
    assert np.allclose(W @ v, np.cross(w, v))


@pytest.mark.parametrize("scale", [1e-10, 1e-6, 1e-2, 1.0, 3.0])
def test_exp_log_roundtrip(scale):
    w = rand_w(scale)
    R = so3.exp(w)
    # R is a rotation
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    w2 = so3.log(R)
    if np.linalg.norm(w) <= np.pi:
        assert np.allclose(w2, w, atol=1e-9)
    else:  # log returns the principal branch; rotations must still agree
        assert np.allclose(so3.exp(w2), R, atol=1e-9)


def test_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    for ang in [np.pi - 1e-7, np.pi - 1e-3, 3.1, np.pi]:
        w = jnp.asarray(axis * ang)
        R = so3.exp(w)
        w2 = so3.log(R)
        assert np.allclose(so3.exp(w2), R, atol=1e-8), ang


def test_exp_matches_scipy():
    from scipy.spatial.transform import Rotation
    w = np.array(rand_w(2.0))  # writable copy — scipy rejects read-only buffers
    assert np.allclose(so3.exp(jnp.asarray(w)), Rotation.from_rotvec(w).as_matrix())


def test_project_restores_orthogonality():
    w = rand_w()
    R = so3.exp(w) + 1e-4 * RNG.standard_normal((3, 3))
    Rp = so3.project(jnp.asarray(R))
    assert np.allclose(Rp @ Rp.T, np.eye(3), atol=1e-9)


def test_right_jacobian_fd():
    w = rand_w()
    Jr = so3.right_jacobian(w)
    eps = 1e-7
    for i in range(3):
        dw = np.zeros(3)
        dw[i] = eps
        num = so3.log(jnp.asarray(so3.exp(w).T) @ so3.exp(w + jnp.asarray(dw))) / eps
        assert np.allclose(Jr[:, i], num, atol=1e-5)


def test_dAB_helpers():
    A = jnp.asarray(RNG.standard_normal((3, 3)))
    B = jnp.asarray(RNG.standard_normal((3, 3)))
    # d vec_r(AB)/d vec_r(A) — row-major
    JA = so3.dAB_dA(B, 3, 3)
    JB = so3.dAB_dB(A, 3, 3)
    fA = lambda a: (a.reshape(3, 3) @ B).reshape(-1)
    fB = lambda b: (A @ b.reshape(3, 3)).reshape(-1)
    assert np.allclose(JA, jax.jacfwd(fA)(A.reshape(-1)))
    assert np.allclose(JB, jax.jacfwd(fB)(B.reshape(-1)))


def test_upper_tri():
    u = jnp.arange(1.0, 7.0)
    U = so3.upper_tri_from6(u)
    assert np.allclose(U, np.array([[1, 2, 3], [0, 4, 5], [0, 0, 6.0]]))
    # dA_dAu maps the 6-param update into the right slots
    D = so3.dA_dAu(dtype=jnp.float64)
    assert np.allclose((D @ u).reshape(3, 3), U)


def test_se3_compose_inverse():
    g1 = se3.SE3(so3.exp(rand_w()), rand_w())
    g2 = se3.SE3(so3.exp(rand_w()), rand_w())
    X = rand_w()
    assert np.allclose((g1 * g2).act(X), g1.act(g2.act(X)), atol=1e-12)
    gi = g1.inverse()
    assert np.allclose((g1 * gi).R, np.eye(3), atol=1e-12)
    assert np.allclose((g1 * gi).T, 0, atol=1e-12)


def test_batched_exp():
    ws = jnp.asarray(RNG.standard_normal((8, 3)))
    Rs = so3.exp(ws)
    for i in range(8):
        assert np.allclose(Rs[i], so3.exp(ws[i]))
    ws2 = so3.log(Rs)
    assert np.allclose(ws2, ws, atol=1e-9)
