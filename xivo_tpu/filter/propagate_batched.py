"""Fully-batched frame propagation (propagation_mode="batched").

The deepest TPU-native rewrite of the IMU propagation: instead of a
sequential while-loop over substeps (each step dozens of small kernels),
ALL substeps of a frame are laid out on a static (n_intervals, S) grid
and processed with batched ops + two log-depth associative scans:

  1. Substep inputs (midpoint gyro/accel from the linear interpolation
     the reference uses, src/estimator.cpp:558-567) are computed in one
     shot — no data-dependent control flow; empty slots carry h = 0 and
     become exact no-ops (dR = I, Phi = I, Q = 0).
  2. Rotation trajectory: R_k = Rsb ∘ prefix-product(exp(w_k h_k)) via
     jax.lax.associative_scan over 3x3 matmuls.
  3. Velocity/position: batched world-frame increments + cumsums
     (midpoint rule — matches the "fast" mode's local order).
  4. Covariance: per-substep discrete transitions
     Phi_k = I + F_k h + (F_k h)^2/2 built by ONE vmapped Jacobian
     batch, then composed with the associative pair rule
     (Phi, Q)_a ∘ (Phi, Q)_b = (Phi_b Phi_a, Phi_b Q_a Phi_b^T + Q_b),
     one P application per frame.

Substep rule: n_i = ceil(dt_i / h0) uniform substeps per interval,
capped at cfg.max_substeps (coarser h when an interval is abnormally
long) — replaces the reference's greedy half-step loop with a static
grid of the same resolution for nominal rates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import so3
from . import layout as L
from .config import VIOConfig
from .propagate import motion_jacobians
from .state import VIOState


def propagate_frame_batched(cfg: VIOConfig, s: VIOState, imu_gyro,
                            imu_accel, imu_dt, dt_eff) -> VIOState:
    dtype = s.P.dtype
    m = L.MOTION
    S = cfg.max_substeps
    h0 = cfg.stepsize
    g = jnp.asarray(cfg.gravity, dtype)
    Qimu = jnp.asarray(
        (list(cfg.Qimu_gyro) + list(cfg.Qimu_accel)
         + list(cfg.Qimu_gyro_bias) + list(cfg.Qimu_accel_bias)), dtype)
    Qimu = jnp.diag(Qimu ** 2)

    KI = imu_dt.shape[0]
    # interval table: KI sample intervals + the frame segment
    dts = jnp.concatenate([imu_dt, dt_eff[None]])          # (KI+1,)
    g_end = jnp.concatenate([imu_gyro, jnp.zeros((1, 3), dtype)])
    a_end = jnp.concatenate([imu_accel, jnp.zeros((1, 3), dtype)])

    # start values / slopes per interval (linear interpolation semantics)
    g_start = jnp.concatenate([s.last_gyro[None], imu_gyro])  # (KI+1,3)
    a_start = jnp.concatenate([s.last_accel[None], imu_accel])
    safe = jnp.maximum(dts, 1e-12)[:, None]
    slope_g = (g_end - g_start) / safe
    slope_a = (a_end - a_start) / safe
    # the frame segment extrapolates with the LAST valid sample's slope
    has = dts[:KI] > 0
    n_valid = jnp.sum(has.astype(jnp.int32))
    last_idx = jnp.clip(n_valid - 1, 0, KI - 1)
    sg_frame = jnp.where(n_valid > 0, slope_g[last_idx], s.slope_gyro)
    sa_frame = jnp.where(n_valid > 0, slope_a[last_idx], s.slope_accel)
    slope_g = slope_g.at[KI].set(sg_frame)
    slope_a = slope_a.at[KI].set(sa_frame)
    # frame-segment start = extrapolation from the last sample
    g_start = g_start.at[KI].set(
        jnp.where(n_valid > 0, imu_gyro[last_idx], s.last_gyro))
    a_start = a_start.at[KI].set(
        jnp.where(n_valid > 0, imu_accel[last_idx], s.last_accel))

    # substep counts per interval, packed onto a COMPACT global grid of
    # K_TOT slots (vs a wasteful (KI+1, S) outer product): slot k maps to
    # its interval via searchsorted on the cumulative substep counts
    n_sub = jnp.clip(jnp.ceil(dts / h0).astype(jnp.int32), 1, S)
    n_sub = jnp.where(dts > 0, n_sub, 0)
    h_i = jnp.where(n_sub > 0, dts / jnp.maximum(n_sub, 1), 0.0)

    K = cfg.total_substeps
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(n_sub)])          # (KI+2,)
    ks = jnp.arange(K)
    itv = jnp.clip(jnp.searchsorted(starts, ks, side="right") - 1,
                   0, KI).astype(jnp.int32)
    local = ks - starts[itv]
    valid = ks < starts[-1]

    h = jnp.where(valid, h_i[itv], 0.0)                    # (K,)
    t_mid = (local.astype(dtype) + 0.5) * h_i[itv]
    gyro_mid = g_start[itv] + slope_g[itv] * t_mid[:, None]
    accel_mid = a_start[itv] + slope_a[itv] * t_mid[:, None]

    # calibrated increments (batched)
    w = gyro_mid @ s.X.Cg.T - s.X.bg[None, :]
    a_cal = accel_mid @ s.X.Ca.T - s.X.ba[None, :]
    dR = so3.exp(w * h[:, None])                           # (K,3,3)

    # rotation prefix products: R at substep START
    prods = jax.lax.associative_scan(jnp.matmul, dR)       # inclusive
    eyeK = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (1, 3, 3))
    prefix_excl = jnp.concatenate([eyeK, prods[:-1]], axis=0)
    R_start = s.X.Rsb[None] @ prefix_excl                  # (K,3,3)
    R_half = jnp.where((h > 0)[:, None, None],
                       R_start @ so3.exp(w * (0.5 * h)[:, None]),
                       R_start)

    # velocity / position (midpoint rule)
    dV = (jnp.einsum("kij,kj->ki", R_half, a_cal)
          + g[None, :]) * h[:, None]
    V_start = s.X.Vsb[None, :] + jnp.concatenate(
        [jnp.zeros((1, 3), dtype), jnp.cumsum(dV[:-1], axis=0)])
    dT = (V_start + 0.5 * dV) * h[:, None]
    V_end = s.X.Vsb + jnp.sum(dV, axis=0)
    T_end = s.X.Tsb + jnp.sum(dT, axis=0)
    R_end = so3.project(s.X.Rsb @ prods[-1])

    # covariance transitions: one vmapped Jacobian batch
    def FG(Rk, gy, ac):
        Xk = s.X._replace(Rsb=Rk)
        return motion_jacobians(Xk, gy, ac, g, dtype)

    F, G = jax.vmap(FG)(R_half, gyro_mid, accel_mid)       # (K,39,39)
    Fh = F * h[:, None, None]
    eye = jnp.eye(m, dtype=dtype)
    Phi = eye[None] + Fh + 0.5 * jnp.einsum("kij,kjl->kil", Fh, Fh)
    Qk = jnp.einsum("kij,jl,kml->kim", G, Qimu, G) * h[:, None, None]

    def combine(a, b):
        Pa, Qa = a
        Pb, Qb = b
        return (Pb @ Pa, Pb @ Qa @ jnp.swapaxes(Pb, -1, -2) + Qb)

    Phi_tot, Q_tot = jax.lax.associative_scan(combine, (Phi, Qk))
    Phi_f = Phi_tot[-1]
    Q_f = Q_tot[-1]

    qm = jnp.zeros((m,), dtype)
    qm = qm.at[L.WSB:L.WSB + 3].set(cfg.Qmodel_Wsb ** 2)
    qm = qm.at[L.WBC:L.WBC + 3].set(cfg.Qmodel_Wbc ** 2)
    qm = qm.at[L.WSG:L.WSG + 2].set(cfg.Qmodel_Wsg ** 2)
    nprop = jnp.sum((dts > 0).astype(dtype))
    Pmm = Phi_f @ s.P[:m, :m] @ Phi_f.T + Q_f + nprop * jnp.diag(qm)
    Pms = Phi_f @ s.P[:m, m:]
    P = s.P.at[:m, :m].set(0.5 * (Pmm + Pmm.T))
    P = P.at[:m, m:].set(Pms)
    P = P.at[m:, :m].set(Pms.T)

    # measurement bookkeeping for the next frame
    lg = jnp.where(n_valid > 0, imu_gyro[last_idx], s.last_gyro) \
        + sg_frame * dt_eff
    la = jnp.where(n_valid > 0, imu_accel[last_idx], s.last_accel) \
        + sa_frame * dt_eff
    X = s.X._replace(Rsb=R_end, Tsb=T_end, Vsb=V_end)
    return s._replace(X=X, P=P, last_gyro=lg.astype(dtype),
                      last_accel=la.astype(dtype),
                      slope_gyro=sg_frame.astype(dtype),
                      slope_accel=sa_frame.astype(dtype))
