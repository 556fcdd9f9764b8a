"""Closed-form visual-inertial initialization (velocity / gravity /
feature-depth bootstrap).

Capability the reference LACKS: XIVO requires a near-stationary start
(gravity init from averaged accel, src/estimator.cpp:439-473) and a
velocity prior; a filter cold-started mid-motion with the wrong
velocity locks its gauge to a bad hypothesis (measured — see
ARCHITECTURE.md roadmap #4). This module solves the classic
Martinelli-style linear system over a short window so a filter segment
can start ANYWHERE on a trajectory — the enabler for segment-parallel
processing of long trajectories (dist/segments.py).

Formulation (all in the body frame at the window start, "b0"):

  R_{b0,bk}   gyro-only preintegrated rotations (no attitude needed)
  beta_k      = double integral of R_{b0,b}(tau) @ f^b(tau) (specific
                force), so  p_k^{b0} = v0*t_k + 0.5*g^{b0}*t_k^2 + beta_k
  feature j   X^{b0} = Rbc (lam_j * u0_j) + Tbc   with u0_j the
                unprojected unit-depth ray of the first observation

  observation of j at frame k (ray uk_j):
     [uk_j]_x  Rbc^T ( R_{b0,bk}^T (X^{b0} - p_k^{b0}) - Tbc ) = 0

linear in the unknowns x = [v0 (3), g^{b0} (3), lam_1..lam_F] — the
accelerometer fixes metric scale, so monocular depth is observable.
Solved by ridge-regularized normal equations, fully on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from .config import VIOConfig


class VIInit(NamedTuple):
    v0: jnp.ndarray        # (3,) velocity in the b0 frame
    g_b0: jnp.ndarray      # (3,) gravity in the b0 frame
    depths: jnp.ndarray    # (F,) feature depths along the first ray
    Rsb0: jnp.ndarray      # (3,3) gravity-aligned spatial <- b0
    Vsb0: jnp.ndarray      # (3,) velocity in that spatial frame
    cond_ok: jnp.ndarray   # () bool — system was well conditioned
    resid: jnp.ndarray     # () mean squared epipolar residual


def _preintegrate(gyro, accel, imu_dt, frame_dt):
    """Per-frame gyro-only preintegration in the b0 (frame-0 body) frame.

    Packing convention (runner.pack_frame_inputs via sim/stream.py):
    IMU row k holds the samples BETWEEN frame k-1 and frame k, with
    frame_dt[k] the tail gap from the last sample to frame k's time.
    Returns (R (K,3,3), beta (K,3), t (K,)) AT each frame time, with
    frame 0 = (I, 0, 0). beta is the double integral of the rotated
    specific force; the velocity preintegral starts at zero, so the
    true position in b0 is p_k = v0*t_k + 0.5*g*t_k^2 + beta_k.
    """
    K = frame_dt.shape[0]
    dtype = gyro.dtype
    eye = jnp.eye(3, dtype=dtype)

    def step(c, w, a, h):
        R, v, p, t = c
        Rm = R @ so3.exp(w * (0.5 * h))
        fa = Rm @ a
        return (R @ so3.exp(w * h), v + fa * h,
                p + v * h + 0.5 * fa * h * h, t + h)

    def frame_body(carry, inp):
        gy_r, ac_r, dt_r, fdt = inp

        def samp(c, si):
            return step(c, *si), None

        c, _ = jax.lax.scan(samp, carry, (gy_r, ac_r, dt_r))
        # tail to the frame time, holding the last valid sample
        last = jnp.maximum(jnp.sum((dt_r > 0).astype(jnp.int32)) - 1, 0)
        c = step(c, gy_r[last], ac_r[last], fdt)
        return c, (c[0], c[2], c[3])

    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            jnp.zeros((), dtype))
    _, (Rs, betas, ts) = jax.lax.scan(
        frame_body, init,
        (gyro[1:], accel[1:], imu_dt[1:], frame_dt[1:]))
    Rs = jnp.concatenate([eye[None], Rs])
    betas = jnp.concatenate([jnp.zeros((1, 3), dtype), betas])
    ts = jnp.concatenate([jnp.zeros((1,), dtype), ts])
    return Rs, betas, ts


def vi_bootstrap(cfg: VIOConfig, intrin, gyro, accel, imu_dt, frame_dt,
                 meas_id, meas_xp, meas_valid, meas_depth=None,
                 g_norm: float = 9.8, ridge: float = 1e-6,
                 max_feats: int = 32) -> VIInit:
    """Closed-form init from a K-frame window of packed FrameInputs
    slices: gyro/accel (K, KI, 3), imu_dt (K, KI), frame_dt (K,),
    meas_* (K, M). Frame 0's measurements define the reference rays;
    frames 1..K-1 contribute epipolar equations. Feature identity
    follows meas_id (POINTCLOUD association; an image pipeline passes
    track ids)."""
    dtype = gyro.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    Rbc = so3.exp(jnp.asarray(cfg.X_Wbc, dtype))
    Tbc = jnp.asarray(cfg.X_Tbc, dtype)
    Rcb = Rbc.T
    K, M = meas_id.shape
    F = max_feats

    Rk, beta, tk = _preintegrate(gyro, accel, imu_dt, frame_dt)

    # select up to F features visible in frame 0 (valid ids first)
    fsel = jnp.argsort(~meas_valid[0])[:F]
    fid = jnp.where(meas_valid[0, fsel], meas_id[0, fsel], -1)    # (F,)

    def ray(xp):
        xc = cam_mod.unproject(kind, intrin, xp)
        return jnp.concatenate([xc, jnp.ones((1,), dtype)])

    u0 = jax.vmap(ray)(meas_xp[0, fsel])                  # (F, 3)
    d0 = (Rbc @ u0.T).T                                   # (F, 3) rays in b0

    def frame_eqs(k):
        ids_k = jnp.where(meas_valid[k], meas_id[k], -2)

        def find(f):
            hit = ids_k == fid[f]
            return jnp.argmax(hit), jnp.any(hit) & (fid[f] >= 0) & (k > 0)

        j, ok = jax.vmap(find)(jnp.arange(F))
        uk = jax.vmap(ray)(meas_xp[k, j])                 # (F, 3)
        Rk_t = Rk[k].T
        tkk = tk[k]
        A_v = -Rcb @ Rk_t * tkk                           # (3,3)
        A_g = -Rcb @ Rk_t * (0.5 * tkk * tkk)
        b_const = Rcb @ (Rk_t @ (Tbc - beta[k]) - Tbc)

        def one(f):
            A_lam = Rcb @ Rk_t @ d0[f]                    # (3,)
            Ux = so3.hat(uk[f])
            okf = ok[f].astype(dtype)
            return (Ux @ A_v * okf, Ux @ A_g * okf,
                    (Ux @ A_lam) * okf, -(Ux @ b_const) * okf)

        return jax.vmap(one)(jnp.arange(F))

    Av, Ag, Al, rhs = jax.vmap(frame_eqs)(jnp.arange(K))
    N = 6 + F
    E = K * F * 3
    if meas_depth is not None:
        # depth-aided mode (simulation hints / RGB-D / stereo): lam is
        # KNOWN, the system reduces to (v0, g) — far better conditioned
        lam_known = meas_depth[0, fsel]                   # (F,)
        rhs = rhs - Al * lam_known[None, :, None]
        A = jnp.concatenate([Av.reshape(E, 3), Ag.reshape(E, 3)], axis=1)
        b = rhs.reshape(E)
        A = jnp.concatenate(
            [A, jnp.zeros((E, F), dtype)], axis=1)        # keep x layout
    else:
        # dense LS over x = [v0(3), g(3), lam(F)]
        lam_oh = jnp.eye(F, dtype=dtype)                  # (F, F)
        # lam block: equation row (k,f,:) has Al in column f
        Alam = jnp.einsum("kfe,fg->kfeg", Al, lam_oh).reshape(E, F)
        A = jnp.concatenate(
            [Av.reshape(E, 3), Ag.reshape(E, 3), Alam], axis=1)
        b = rhs.reshape(E)

    AtA = A.T @ A + ridge * jnp.eye(N, dtype=dtype)
    x = jnp.linalg.solve(AtA, A.T @ b)
    v0, g_b0, lam = x[0:3], x[3:6], x[6:]

    # ||g||-constrained refinement (the gravity magnitude is known):
    # over short windows the v0*t and 0.5*g*t^2 columns are nearly
    # collinear and the ridge solution trades v0 into g; re-solving with
    # g on the known sphere (2-dof tangent parametrization, iterated)
    # restores the velocity. Standard VI-initialization practice.
    Ag = A[:, 3:6]
    Arest = jnp.concatenate([A[:, 0:3], A[:, 6:]], axis=1)   # (E, 3+F)

    def refine(carry, _):
        g_prev = carry
        ghat = g_prev / jnp.maximum(jnp.linalg.norm(g_prev), 1e-9)
        # tangent basis at ghat
        up = jnp.where(jnp.abs(ghat[2]) < 0.9,
                       jnp.asarray([0.0, 0.0, 1.0], dtype),
                       jnp.asarray([1.0, 0.0, 0.0], dtype))
        b1 = jnp.cross(ghat, up)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
        b2 = jnp.cross(ghat, b1)
        Bt = jnp.stack([b1, b2], axis=1)                     # (3, 2)
        A2 = jnp.concatenate([Arest, Ag @ Bt], axis=1)
        b2r = b - Ag @ (g_norm * ghat)
        M2 = A2.T @ A2 + ridge * jnp.eye(A2.shape[1], dtype=dtype)
        x2 = jnp.linalg.solve(M2, A2.T @ b2r)
        dg = x2[-2:]
        g_new = g_norm * ghat + Bt @ dg
        g_new = g_norm * g_new / jnp.maximum(jnp.linalg.norm(g_new), 1e-9)
        return g_new, x2

    g_b0, x2s = jax.lax.scan(refine, g_b0, None, length=4)
    x2 = jax.tree.map(lambda a: a[-1], x2s)
    v0, lam = x2[0:3], x2[3:3 + F]
    x = jnp.concatenate([v0, g_b0, lam])
    if meas_depth is not None:
        lam = meas_depth[0, fsel]

    resid = jnp.mean((A @ x - b) ** 2)
    gn = jnp.linalg.norm(g_b0)
    cond_ok = (jnp.linalg.eigvalsh(AtA[:6, :6])[0] > 1e3 * ridge) \
        & (gn > 0.5 * g_norm) & (gn < 1.5 * g_norm)

    # gravity-aligned spatial frame: minimal rotation taking ghat_b0 to
    # -e_z (yaw unobservable; pick zero)
    ghat = g_b0 / jnp.maximum(gn, 1e-9)
    tgt = jnp.asarray([0.0, 0.0, -1.0], dtype)
    vcr = jnp.cross(ghat, tgt)
    sn = jnp.linalg.norm(vcr)
    axis = vcr / jnp.maximum(sn, 1e-9)
    ang = jnp.arctan2(sn, ghat @ tgt)
    Rsb0 = so3.exp(axis * ang)
    return VIInit(v0=v0, g_b0=g_b0, depths=lam, Rsb0=Rsb0,
                  Vsb0=Rsb0 @ v0, cond_ok=cond_ok, resid=resid)
