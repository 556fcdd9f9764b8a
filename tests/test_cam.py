"""Camera model tests: project/unproject round trips + Jacobian FD checks.

Parity targets: the reference's unittest_camera_{pinhole,radtan,equi,atan}
driven by src/test/camera_configs.json — same fixture values reproduced
here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu import cam

# fixtures mirroring src/test/camera_configs.json (equidistant = TUM-VI
# cam0-style, radtan/pinhole = VGA-style)
FIXTURES = {
    cam.PINHOLE: dict(model="pinhole", rows=480, cols=640,
                      fx=275.0, fy=274.0, cx=319.5, cy=239.5),
    cam.RADTAN: dict(model="radtan", rows=480, cols=640,
                     fx=275.0, fy=274.0, cx=319.5, cy=239.5,
                     p1=0.0007, p2=-0.0008, k1=-0.28, k2=0.07, k3=-0.005),
    cam.EQUIDISTANT: dict(model="equidistant", rows=512, cols=512,
                          fx=190.97, fy=190.9, cx=254.93, cy=256.9,
                          k0=0.0034, k1=0.0007, k2=-0.0046, k3=0.0014),
    cam.ATAN: dict(model="atan", rows=480, cols=640,
                   fx=0.535719 * 640, fy=0.713912 * 480,
                   cx=0.452066 * 640, cy=0.646479 * 480, w=0.936),
}


@pytest.mark.parametrize("kind", list(FIXTURES))
def test_roundtrip(kind):
    k, intrin, _ = cam.intrinsics_from_cfg(FIXTURES[kind])
    assert k == kind
    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 2)))
    proj = jax.vmap(lambda v: cam.project(kind, intrin, v))
    unproj = jax.vmap(lambda v: cam.unproject(kind, intrin, v))
    xp = proj(xc)
    xc2 = unproj(xp)
    assert np.allclose(xc2, xc, atol=1e-8), np.abs(xc2 - xc).max()


@pytest.mark.parametrize("kind", list(FIXTURES))
def test_jacobians_fd(kind):
    _, intrin, _ = cam.intrinsics_from_cfg(FIXTURES[kind])
    xc = jnp.asarray([0.21, -0.34])
    xp, dxc, dp = cam.project_with_jac(kind, intrin, xc)
    eps = 1e-7
    for i in range(2):
        d = jnp.zeros(2).at[i].set(eps)
        num = (cam.project(kind, intrin, xc + d) - cam.project(kind, intrin, xc - d)) / (2 * eps)
        assert np.allclose(dxc[:, i], num, atol=1e-6)
    dim = cam.MODEL_DIM[kind]
    for i in range(dim):
        d = jnp.zeros(cam.MAX_INTRINSICS).at[i].set(eps)
        num = (cam.project(kind, intrin + d, xc) - cam.project(kind, intrin - d, xc)) / (2 * eps)
        assert np.allclose(dp[:, i], num, atol=1e-5)
    # parameters beyond the model DIM are inert
    assert np.allclose(dp[:, dim:], 0.0)


def test_pinhole_exact():
    _, intrin, _ = cam.intrinsics_from_cfg(FIXTURES[cam.PINHOLE])
    xc = jnp.asarray([0.1, -0.2])
    xp = cam.project(cam.PINHOLE, intrin, xc)
    assert np.allclose(xp, [275.0 * 0.1 + 319.5, 274.0 * -0.2 + 239.5])


def test_radtan_distortion_direction():
    # negative k1 pulls points toward the center (barrel distortion)
    _, intrin, _ = cam.intrinsics_from_cfg(FIXTURES[cam.RADTAN])
    xc = jnp.asarray([0.4, 0.0])
    xp = cam.project(cam.RADTAN, intrin, xc)
    xp_pin = 275.0 * 0.4 + 319.5
    assert xp[0] < xp_pin
