"""Camera models as pure functions over a padded intrinsics vector.

Replaces the reference's CRTP camera classes (``common/camera_pinhole.h``,
``camera_radtan.h``, ``camera_equidist.h``, ``camera_atan.h``) and the
singleton ``CameraManager`` (``src/camera_manager.h``).

Design: every model reads its parameters from one fixed-size vector of
``MAX_INTRINSICS = 9`` entries, so camera intrinsics slot directly into
the filter's error state (online camera auto-calibration = nonzero
covariance on those entries). The model *kind* is a static Python int
chosen at trace time, so each config compiles a single specialized
program. Jacobians come from ``jax.jacfwd`` of the closed forms — exact,
and XLA fuses them into the surrounding computation.

Parameter layout (index into the 9-vector):
  pinhole     : [fx fy cx cy  0  0  0  0  0 ]         DIM = 4
  atan        : [fx fy cx cy  w  0  0  0  0 ]         DIM = 5
  equidistant : [fx fy cx cy k0 k1 k2 k3  0 ]         DIM = 8
  radtan      : [fx fy cx cy p1 p2 k1 k2 k3]          DIM = 9
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_INTRINSICS = 9

PINHOLE = 0
ATAN = 1
EQUIDISTANT = 2
RADTAN = 3

MODEL_IDS = {"pinhole": PINHOLE, "atan": ATAN, "equi": EQUIDISTANT,
             "equidistant": EQUIDISTANT, "radtan": RADTAN}
MODEL_DIM = {PINHOLE: 4, ATAN: 5, EQUIDISTANT: 8, RADTAN: 9}


def _distort_pinhole(xc, p):
    return xc


def _distort_atan(xc, p):
    # FOV model (Devernay & Faugeras); ref common/camera_atan.h:26-60
    w = p[4]
    r = jnp.sqrt(jnp.sum(xc * xc) + 1e-20)
    w2 = 2.0 * jnp.tan(w * 0.5)
    f = jnp.arctan(w2 * r) / (w * r)
    singular = (r < 1e-4) | (jnp.abs(w) < 1e-8)
    f = jnp.where(singular, 1.0, f)
    return xc * f


def _distort_equidistant(xc, p):
    # ref common/camera_equidist.h:28-98
    k0, k1, k2, k3 = p[4], p[5], p[6], p[7]
    r = jnp.sqrt(jnp.sum(xc * xc) + 1e-20)
    th = jnp.arctan(r)
    th2 = th * th
    rd = th * (1.0 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3))))
    scale = jnp.where(r < 1e-8, 1.0, rd / r)
    return xc * scale


def _distort_radtan(xc, p):
    # OpenCV radial-tangential; ref common/camera_radtan.h:21-100
    p1, p2, k1, k2, k3 = p[4], p[5], p[6], p[7], p[8]
    x, y = xc[0], xc[1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd])


_DISTORT = {PINHOLE: _distort_pinhole, ATAN: _distort_atan,
            EQUIDISTANT: _distort_equidistant, RADTAN: _distort_radtan}


def project(kind: int, intrin, xc):
    """Normalized camera coords xc=(X/Z, Y/Z) -> pixel coords (2,)."""
    xd = _DISTORT[kind](xc, intrin)
    return intrin[:2] * xd + intrin[2:4]


def project_with_jac(kind: int, intrin, xc):
    """Returns (xp, dxp_dxc (2,2), dxp_dintrin (2, MAX_INTRINSICS))."""
    xp = project(kind, intrin, xc)
    dxp_dxc = jax.jacfwd(lambda v: project(kind, intrin, v))(xc)
    dxp_dp = jax.jacfwd(lambda q: project(kind, q, xc))(intrin)
    return xp, dxp_dxc, dxp_dp


def unproject(kind: int, intrin, xp, iters: int = 15):
    """Pixel coords -> normalized camera coords via Newton iterations.

    Mirrors the reference's iterative UnProject (fixed iteration count so
    the loop unrolls/compiles; ref camera_radtan.h:103-160).
    """
    xk = (xp - intrin[2:4]) / intrin[:2]
    if kind == PINHOLE:
        return xk
    dist = _DISTORT[kind]

    def body(_, xc):
        r = dist(xc, intrin) - xk
        J = jax.jacfwd(lambda v: dist(v, intrin))(xc)
        # 2x2 solve (closed form; guards against singular J)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = jnp.stack([
            (J[1, 1] * r[0] - J[0, 1] * r[1]) / det,
            (J[0, 0] * r[1] - J[1, 0] * r[0]) / det,
        ])
        return xc - dx

    return jax.lax.fori_loop(0, iters, body, xk)


def intrinsics_from_cfg(cfg: dict, dtype=jnp.float64):
    """Build (kind, intrinsics vector, (rows, cols)) from a camera_cfg dict.

    Mirrors ``CameraManager::Create`` parameter unpacking
    (``src/camera_manager.cpp``).
    """
    kind = MODEL_IDS[cfg["model"].lower()]
    base = [cfg["fx"], cfg["fy"], cfg["cx"], cfg["cy"]]
    if kind == PINHOLE:
        extra = []
    elif kind == ATAN:
        extra = [cfg.get("w", cfg.get("k0", 0.0))]
    elif kind == EQUIDISTANT:
        extra = [cfg[k] for k in ("k0", "k1", "k2", "k3")]
    else:  # RADTAN
        extra = [cfg.get("p1", 0.0), cfg.get("p2", 0.0),
                 cfg.get("k1", 0.0), cfg.get("k2", 0.0), cfg.get("k3", 0.0)]
    v = base + list(extra)
    v = v + [0.0] * (MAX_INTRINSICS - len(v))
    return kind, jnp.asarray(v, dtype=dtype), (cfg["rows"], cfg["cols"])
