"""SO(3) Lie-group calculus on rotation matrices.

TPU-native replacement for the reference's Sophus usage and
``common/rodrigues.h`` (hat/vee/exp/log and matrix-derivative helpers).
Rotations are represented as 3x3 matrices: every consumer in the filter
multiplies them into other matrices/vectors, which maps straight onto the
MXU, and re-orthonormalization is a cheap Newton polar iteration.

All functions are pure, jit/vmap-safe, and dtype-polymorphic (follow the
input dtype). Small-angle branches use smooth Taylor switches via
``jnp.where`` so gradients are finite everywhere.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix such that hat(w) @ v == cross(w, v).

    Mirrors ``common/rodrigues.h:hat``.
    """
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([z, -w2, w1], axis=-1),
            jnp.stack([w2, z, -w0], axis=-1),
            jnp.stack([-w1, w0, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of :func:`hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w):
    """Rodrigues formula: rotation-vector -> rotation matrix.

    exp(hat(w)) = I + sinc(t) hat(w) + ((1-cos t)/t^2) hat(w)^2,  t = |w|.
    Taylor expansions keep it smooth through t = 0.
    """
    t2 = jnp.sum(w * w, axis=-1)
    t = jnp.sqrt(t2)
    small = t2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / jnp.where(small, 1.0, t))
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R):
    """Rotation matrix -> rotation vector (principal branch, |w| <= pi).

    Uses the numerically-stable quaternion route: build the quaternion from
    the rotation matrix with the max-trace branch trick, then quaternion ->
    axis-angle. Stable near 0 and near pi (where the classic
    ``vee(R - R^T)/(2 sinc)`` formula blows up).
    """
    # quaternion (w, x, y, z) from rotation matrix, branch-free
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the best-conditioned one
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    # canonicalize to qw >= 0 so the angle is in [0, pi]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)

    qw = jnp.clip(q[..., 0], -1.0, 1.0)
    qv = q[..., 1:]
    sin_half = jnp.linalg.norm(qv, axis=-1)
    half = jnp.arctan2(sin_half, qw)
    small = sin_half < _EPS
    scale = jnp.where(small, 2.0 + 2.0 * half * half / 3.0,
                      2.0 * half / jnp.where(small, 1.0, sin_half))
    return scale[..., None] * qv


def project(R):
    """Re-orthonormalize a near-rotation matrix (Newton polar iteration).

    Two iterations of R <- R (3 I - R^T R) / 2 restore orthogonality to
    machine precision for drifts typical of integrated rotations. Replaces
    the reference's periodic ``SO3::normalize`` (``src/core.h:154-161``).
    """
    eye3 = jnp.eye(3, dtype=R.dtype)
    for _ in range(2):
        R = R @ (1.5 * eye3 - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def right_jacobian(w):
    """Jr(w): d/du log( exp(w)^-1 exp(w+u) ) at u=0.

    Jr = I - (1-cos t)/t^2 W + (t - sin t)/t^3 W^2.
    """
    t2 = jnp.sum(w * w, axis=-1)
    t = jnp.sqrt(t2)
    small = t2 < _EPS
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (t - jnp.sin(t)) / jnp.where(small, 1.0, t2 * t))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * (W @ W)


# --- matrix-derivative helpers (replace common/rodrigues.h:dAB_dA etc.) ---

def dAB_dA(B, m: int, n: int):
    """d vec_r(A@B) / d vec_r(A) for A (m x n), B (n x p); row-major vec.

    Returns (m*p, m*n) == kron(I_m, B^T) — built as one einsum so it
    lowers to a single kernel (this runs inside the propagation hot loop).
    Mirrors ``dAB_dA`` in ``common/rodrigues.h``.
    """
    p = B.shape[-1]
    eye = jnp.eye(m, dtype=B.dtype)
    out = jnp.einsum("ik,pn->ipkn", eye, jnp.swapaxes(B, -1, -2))
    return out.reshape(m * p, m * n)


def dAB_dB(A, n: int, p: int):
    """d vec_r(A@B) / d vec_r(B) == kron(A, I_p); single-kernel build."""
    m = A.shape[-2]
    eye = jnp.eye(p, dtype=A.dtype)
    out = jnp.einsum("ij,kl->ikjl", A, eye)
    return out.reshape(m * p, n * p)


def dA_dAu(dtype=jnp.float32):
    """d vec_r(A) / d u where A is 3x3 upper-triangular with u its 6 params.

    Row-major vec of A is (A00,A01,A02, A10,A11,A12, A20,A21,A22); the
    reference parameterizes u = (A00,A01,A02, A11,A12, A22)
    (``common/rodrigues.h:dA_dAu``).
    """
    out = jnp.zeros((9, 6), dtype=dtype)
    rows = [0, 1, 2, 4, 5, 8]
    for k, r in enumerate(rows):
        out = out.at[r, k].set(1.0)
    return out


def upper_tri_from6(u):
    """(6,) -> 3x3 upper-triangular, matching the reference Ca layout."""
    z = jnp.zeros_like(u[0])
    return jnp.stack([
        jnp.stack([u[0], u[1], u[2]], axis=-1),
        jnp.stack([z, u[3], u[4]], axis=-1),
        jnp.stack([z, z, u[5]], axis=-1),
    ], axis=-2)
