"""IMU propagation: nominal state + covariance integration.

Re-derivation of the reference's joint X/F/P integrators
(``src/rk4.cpp``, ``src/princedormand.cpp``) as pure JAX functions.
Design notes:

* The motion Jacobian F (39x39) and noise Jacobian G (39x12) are built
  as dense small matrices — at this size XLA keeps everything in
  registers/VMEM and fuses the stage algebra into a handful of ops.
* Substepping (fixed h with the reference's half-step trick,
  ``src/princedormand.cpp:60-81``) runs as a ``lax.while_loop``; the
  per-frame IMU batch runs as a ``lax.scan`` so the whole propagation
  between two camera frames is one compiled region.
* Covariance handling matches the reference exactly: the motion block
  integrates dP = F P + P F^T + G Qimu G^T through the stages; the
  motion/structure cross block is multiplied by the step transition
  F_total = I + FK*dt after each substep (``src/princedormand.cpp:206-215``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geom import so3
from . import layout as L
from .config import VIOConfig
from .state import MotionState, VIOState


def compose_motion(X: MotionState, V, gyro, accel, dt, g,
                   project: bool = True) -> MotionState:
    """Integrate the nominal state by dt (ref src/estimator.cpp:597-614).

    ``project=False`` skips the polar re-orthonormalization — used inside
    tight substep loops where the caller projects once per frame instead
    (the reference normalizes only every 50 updates, src/core.h:154-161,
    so per-substep projection is stricter than parity requires).
    """
    gyro_calib = X.Cg @ gyro - X.bg
    accel_calib = X.Ca @ accel - X.ba
    Tsb = X.Tsb + V * dt
    Vsb = X.Vsb + (X.Rsb @ accel_calib + X.Rsg @ g) * dt
    Rsb = X.Rsb @ so3.exp(gyro_calib * dt)
    if project:
        Rsb = so3.project(Rsb)
    return X._replace(Rsb=Rsb, Tsb=Tsb, Vsb=Vsb)


def motion_jacobians(X: MotionState, gyro, accel, g, dtype):
    """F (39x39), G (39x12) at the given state/input.

    Ref: Estimator::ComputeMotionJacobianAt (src/estimator.cpp:616-704).
    """
    gyro_calib = X.Cg @ gyro - X.bg
    accel_calib = X.Ca @ accel - X.ba
    Rsb = X.Rsb

    # Only the Wsb/Tsb/Vsb rows of F are nonzero — build them by block
    # CONCATENATION in layout order (Wsb3 Tsb3 Vsb3 bg3 ba3 Wbc3 Tbc3
    # Wsg2 td1 Cg9 Ca6). `.at[].set` block writes each materialize a
    # full-matrix copy inside the scanned propagation loop (measured as
    # dynamic-update-slice hot spots); concat fuses into one write.
    eye3 = jnp.eye(3, dtype=dtype)
    Z33 = jnp.zeros((3, 3), dtype)
    # dV/dWsg, 2 effective columns. With the right-multiplicative Rsg
    # retraction (src/core.h:149) the exact Jacobian of Rsg*g w.r.t. the
    # Wsg tangent is -Rsg hat(g); the reference writes -Rsb hat(g)
    # (src/estimator.cpp:648) which coincides to first order near init —
    # we use the exact form.
    dV_dWsg = -X.Rsg @ so3.hat(g)
    # dW/dCg: row i gets `gyro` at columns 3i..3i+2 (raw measurement!) —
    # built as one kron-style einsum, not a scatter loop
    dW_dCg = (eye3[:, :, None] * gyro[None, None, :]).reshape(3, 9)
    # dV/dCa = dAB_dA(accel) @ dAB_dB(Rsb) @ dA_dAu
    dV_dRCa = so3.dAB_dA(accel[:, None], 3, 3)          # (3, 9)
    dRCa_dCafm = so3.dAB_dB(Rsb, 3, 3)                  # (9, 9)
    dV_dCa = dV_dRCa @ dRCa_dCafm @ so3.dA_dAu(dtype)   # (3, 6)

    rows_W = jnp.concatenate([
        -so3.hat(gyro_calib), Z33, Z33, -eye3, Z33, Z33, Z33,
        jnp.zeros((3, 3), dtype), dW_dCg, jnp.zeros((3, 6), dtype)],
        axis=1)                                          # Wsg2+td1 = 3 zeros
    rows_T = jnp.concatenate([
        Z33, Z33, eye3, jnp.zeros((3, L.MOTION - 9), dtype)], axis=1)
    rows_V = jnp.concatenate([
        -Rsb @ so3.hat(accel_calib), Z33, Z33, Z33, -Rsb, Z33, Z33,
        dV_dWsg[:, :2], jnp.zeros((3, 1 + 9), dtype), dV_dCa], axis=1)
    F = jnp.concatenate(
        [rows_W, rows_T, rows_V,
         jnp.zeros((L.MOTION - 9, L.MOTION), dtype)], axis=0)

    Z312 = jnp.zeros((3, 12), dtype)
    G = jnp.concatenate([
        jnp.concatenate([-eye3, Z33, Z33, Z33], axis=1),   # Wsb rows
        Z312,                                              # Tsb
        jnp.concatenate([Z33, -Rsb, Z33, Z33], axis=1),    # Vsb
        jnp.concatenate([Z33, Z33, eye3, Z33], axis=1),    # bg
        jnp.concatenate([Z33, Z33, Z33, eye3], axis=1),    # ba
        jnp.zeros((L.MOTION - 15, 12), dtype)], axis=0)
    return F, G


class _Carry(NamedTuple):
    X: MotionState
    Pmm: jnp.ndarray    # (39,39) motion covariance block
    Pms: jnp.ndarray    # (39, D-39) motion-structure cross covariance
    total: jnp.ndarray  # () time integrated so far within this sample
    gyro: jnp.ndarray
    accel: jnp.ndarray


def _stage_P(F, G, P0, Qimu):
    return F @ P0 + P0 @ F.T + G @ Qimu @ G.T


def _rk4_substep(X, Pmm, gyro0, accel0, sg, sa, h, g, Qimu, dtype):
    """One RK4 substep; returns (X', Pmm', Ftot). Ref src/rk4.cpp:35-103."""
    half = 0.5 * h

    def jac(Xs, gy, ac):
        return motion_jacobians(Xs, gy, ac, g, dtype)

    K1 = X.Vsb
    F1, G1 = jac(X, gyro0, accel0)
    PK1 = _stage_P(F1, G1, Pmm, Qimu)

    gy, ac = gyro0 + sg * half, accel0 + sa * half
    X2 = compose_motion(X, 0.5 * K1, gy, ac, half, g)
    K2 = X2.Vsb
    F2, G2 = jac(X2, gy, ac)
    FK2 = F2 + F2 @ F1 * half
    PK2 = _stage_P(F2, G2, Pmm + half * PK1, Qimu)

    X3 = compose_motion(X, 0.5 * K2, gy, ac, half, g)
    K3 = X3.Vsb
    F3, G3 = jac(X3, gy, ac)
    FK3 = F3 + F3 @ FK2 * half
    PK3 = _stage_P(F3, G3, Pmm + half * PK2, Qimu)

    gy, ac = gyro0 + sg * h, accel0 + sa * h
    X4 = compose_motion(X, K3, gy, ac, h, g)
    K4 = X4.Vsb
    F4, G4 = jac(X4, gy, ac)
    FK4 = F4 + F4 @ FK3 * h
    PK4 = _stage_P(F4, G4, Pmm + h * PK3, Qimu)

    Ktot = (K1 + 2.0 * (K2 + K3) + K4) / 6.0
    FK = (F1 + 2.0 * (FK2 + FK3) + FK4) / 6.0
    PK = (PK1 + 2.0 * (PK2 + PK3) + PK4) / 6.0

    Xn = compose_motion(X, Ktot, gy, ac, h, g)
    Ftot = jnp.eye(L.MOTION, dtype=dtype) + FK * h
    return Xn, Pmm + PK * h, Ftot, jnp.zeros((), dtype)


_PD_COEFS = dict(
    r_9=1.0 / 9.0, r_2_9=2.0 / 9.0, r_12=1.0 / 12.0, r_324=1.0 / 324.0,
    r_330=1.0 / 330.0, r_28=1.0 / 28.0, r_400=1.0 / 400.0)


def _pd_substep(X, Pmm, gyro0, accel0, sg, sa, h, g, Qimu, dtype):
    """One Prince-Dormand 4(5) substep (7 stages).

    Port of the tableau in src/princedormand.cpp:85-221 (same stage
    weights, same joint F/P combination scheme).
    """
    c = _PD_COEFS

    def jac(Xs, gy, ac):
        return motion_jacobians(Xs, gy, ac, g, dtype)

    def stage(V_comb, FK_comb, PK_comb, frac):
        step = frac * h
        gy, ac = gyro0 + sg * step, accel0 + sa * step
        Xs = compose_motion(X, V_comb, gy, ac, step, g)
        Fs, Gs = jac(Xs, gy, ac)
        K = Xs.Vsb
        FK = Fs + Fs @ FK_comb * h
        PK = _stage_P(Fs, Gs, Pmm + PK_comb * h, Qimu)
        return K, FK, PK

    K1 = X.Vsb
    F1, G1 = jac(X, gyro0, accel0)
    FK1 = F1
    PK1 = _stage_P(F1, G1, Pmm, Qimu)

    K2, FK2, PK2 = stage(c["r_2_9"] * K1, c["r_2_9"] * FK1,
                         c["r_2_9"] * PK1, c["r_2_9"])
    K3, FK3, PK3 = stage(c["r_12"] * (K1 + 3 * K2),
                         c["r_12"] * (FK1 + 3 * FK2),
                         c["r_12"] * (PK1 + 3 * PK2), 3 * c["r_9"])
    K4, FK4, PK4 = stage(c["r_324"] * (55 * K1 - 75 * K2 + 200 * K3),
                         c["r_324"] * (55 * FK1 - 75 * FK2 + 200 * FK3),
                         c["r_324"] * (55 * PK1 - 75 * PK2 + 200 * PK3),
                         5 * c["r_9"])
    K5, FK5, PK5 = stage(
        c["r_330"] * (83 * K1 - 195 * K2 + 305 * K3 + 27 * K4),
        c["r_330"] * (83 * FK1 - 195 * FK2 + 305 * FK3 + 27 * FK4),
        c["r_330"] * (83 * PK1 - 195 * PK2 + 305 * PK3 + 27 * PK4),
        6 * c["r_9"])
    K6, FK6, PK6 = stage(
        c["r_28"] * (-19 * K1 + 63 * K2 + 4 * K3 - 108 * K4 + 88 * K5),
        c["r_28"] * (-19 * FK1 + 63 * FK2 + 4 * FK3 - 108 * FK4 + 88 * FK5),
        c["r_28"] * (-19 * PK1 + 63 * PK2 + 4 * PK3 - 108 * PK4 + 88 * PK5),
        1.0)
    K7, FK7, PK7 = stage(
        c["r_400"] * (38 * K1 + 240 * K3 - 243 * K4 + 330 * K5 + 35 * K6),
        c["r_400"] * (38 * FK1 + 240 * FK3 - 243 * FK4 + 330 * FK5 + 35 * FK6),
        c["r_400"] * (38 * PK1 + 240 * PK3 - 243 * PK4 + 330 * PK5 + 35 * PK6),
        1.0)

    K = (0.0862 * K1 + 0.6660 * K3 - 0.7857 * K4 + 0.9570 * K5
         + 0.0965 * K6 - 0.0200 * K7)
    FK = (0.0862 * FK1 + 0.6660 * FK3 - 0.7857 * FK4 + 0.9570 * FK5
          + 0.0965 * FK6 - 0.0200 * FK7)
    PK = (0.0862 * PK1 + 0.6660 * PK3 - 0.7857 * PK4 + 0.9570 * PK5
          + 0.0965 * PK6 - 0.0200 * PK7)

    gy, ac = gyro0 + sg * h, accel0 + sa * h
    Xn = compose_motion(X, K, gy, ac, h, g)
    Ftot = jnp.eye(L.MOTION, dtype=dtype) + FK * h
    # embedded 4th/5th-order difference on the velocity stages — the
    # error estimate the reference computes but leaves commented out
    # (src/princedormand.cpp:216-220, always returns 0, which neuters its
    # control_stepsize mode into "grow h by max_scale every step"); we
    # return the real thing so adaptive stepping actually adapts.
    diffK = 0.0002 * (44.0 * K1 - 330.0 * K3 + 891.0 * K4 - 660.0 * K5
                      - 45.0 * K6 + 100.0 * K7)
    err = jnp.max(jnp.abs(diffK))
    return Xn, Pmm + PK * h, Ftot, err


def propagate_interval(cfg: VIOConfig, X: MotionState, Pmm, Pms,
                       gyro0, accel0, sg, sa, dt):
    """Integrate over one inter-measurement interval of length dt.

    Substep policy matches src/princedormand.cpp:60-81: fixed h0 with the
    half-step trick, IMU inputs linearly interpolated with slopes (sg, sa).
    With ``pd_control_stepsize`` (PrinceDormand only) the substep size is
    error-controlled: scale = 0.8 (tol·h/err)^(1/4) clipped to
    [pd_min_scale, pd_max_scale], accept-always, matching the loop at
    src/princedormand.cpp:28-59 but with the REAL embedded error (see
    _pd_substep). Returns (X', Pmm', Pms').
    """
    dtype = Pmm.dtype
    g = jnp.asarray(cfg.gravity, dtype)
    Qimu = jnp.asarray(
        (list(cfg.Qimu_gyro) + list(cfg.Qimu_accel)
         + list(cfg.Qimu_gyro_bias) + list(cfg.Qimu_accel_bias)), dtype)
    Qimu = jnp.diag(Qimu ** 2)
    h0 = cfg.stepsize
    substep = _pd_substep if cfg.integration_method == "PrinceDormand" \
        else _rk4_substep

    adaptive = (cfg.pd_control_stepsize
                and cfg.integration_method == "PrinceDormand")

    def cond(carry):
        return carry[0].total < dt

    def body(carry):
        c, h_next = carry
        rem = dt - c.total
        if adaptive:
            # end-of-interval handling per src/princedormand.cpp:53-58:
            # if the controlled step overshoots take exactly the
            # remainder; if 1.5 steps would overshoot, halve so the tail
            # is two balanced half-steps instead of a tiny sliver
            h = jnp.maximum(h_next, 1e-6)
            h = jnp.where(h > rem, rem,
                          jnp.where(1.5 * h > rem, 0.5 * h, h))
        else:
            h = jnp.minimum(h0, rem)
            # half-step trick: halve if 1.5 steps would overshoot
            h = jnp.where((rem > h0) & (rem < 1.5 * h0), 0.5 * h0, h)
        Xn, Pmm_n, Ftot, err = substep(c.X, c.Pmm, c.gyro,
                                       c.accel, sg, sa, h, g, Qimu, dtype)
        Pms_n = Ftot @ c.Pms
        if adaptive:
            scale = jnp.where(
                err <= 0.0, cfg.pd_max_scale,
                jnp.clip(0.8 * (cfg.pd_tolerance * h
                                / jnp.maximum(err, 1e-30)) ** 0.25,
                         cfg.pd_min_scale, cfg.pd_max_scale))
            h_next = h * scale
        return (_Carry(Xn, Pmm_n, Pms_n, c.total + h,
                       c.gyro + sg * h, c.accel + sa * h), h_next)

    init = (_Carry(X, Pmm, Pms, jnp.zeros((), dtype), gyro0, accel0),
            jnp.asarray(h0, dtype))
    out, _ = jax.lax.while_loop(cond, body, init)
    return out.X, out.Pmm, out.Pms


def propagate_interval_fast(cfg: VIOConfig, X: MotionState, gyro0, accel0,
                            sg, sa, dt):
    """Fast propagation: nominal X + accumulated discrete transition.

    The TPU-native fast path (cfg.propagation_mode == "fast"): instead of
    the reference's 7-stage joint X/F/P integration per substep, each
    substep composes a second-order discrete transition
    Phi_i = I + F h + 0.5 (F h)^2 and accumulates the process noise
    Q <- Phi_i Q Phi_i^T + G Qimu G^T h. The covariance itself is NOT
    touched here — the caller applies P <- Phi P Phi^T + Q once per
    measurement interval, amortizing the big triple product. The nominal
    state integrates with the same ComposeMotion midpoint scheme.

    Returns (X', Phi (m,m), Qacc (m,m)).
    """
    dtype = X.Tsb.dtype
    m = L.MOTION
    g = jnp.asarray(cfg.gravity, dtype)
    Qimu = jnp.asarray(
        (list(cfg.Qimu_gyro) + list(cfg.Qimu_accel)
         + list(cfg.Qimu_gyro_bias) + list(cfg.Qimu_accel_bias)), dtype)
    Qimu = jnp.diag(Qimu ** 2)
    h0 = cfg.stepsize
    eye = jnp.eye(m, dtype=dtype)

    class C(NamedTuple):
        X: MotionState
        Phi: jnp.ndarray
        Q: jnp.ndarray
        total: jnp.ndarray
        gyro: jnp.ndarray
        accel: jnp.ndarray

    def cond(c):
        return c.total < dt

    def body(c):
        rem = dt - c.total
        h = jnp.minimum(h0, rem)
        h = jnp.where((rem > h0) & (rem < 1.5 * h0), 0.5 * h0, h)
        # midpoint inputs for the jacobian, RK2-style nominal step
        gy_m = c.gyro + sg * (0.5 * h)
        ac_m = c.accel + sa * (0.5 * h)
        Xm = compose_motion(c.X, c.X.Vsb, gy_m, ac_m, 0.5 * h, g)
        F, G = motion_jacobians(Xm, gy_m, ac_m, g, dtype)
        Xn = compose_motion(c.X, Xm.Vsb, gy_m, ac_m, h, g)
        Fh = F * h
        Phi_i = eye + Fh + 0.5 * (Fh @ Fh)
        Qi = (G @ Qimu @ G.T) * h
        Phi = Phi_i @ c.Phi
        Q = Phi_i @ c.Q @ Phi_i.T + Qi
        return C(Xn, Phi, Q, c.total + h, c.gyro + sg * h,
                 c.accel + sa * h)

    out = jax.lax.while_loop(cond, body, C(
        X, eye, jnp.zeros((m, m), dtype), jnp.zeros((), dtype),
        gyro0, accel0))
    return out.X, out.Phi, out.Q


def propagate_interval_fast_static(cfg: VIOConfig, X: MotionState, gyro0,
                                   accel0, sg, sa, dt):
    """Static-grid fast propagation: same math as propagate_interval_fast
    but over a FIXED, fully-unrolled substep count.

    The while-loop version forces a sequential kernel chain with
    data-dependent length; this one uses n = clip(ceil(dt/h0), 1, S)
    uniform substeps h = dt/n on a static grid of S slots — inactive
    slots carry h = 0 and are exact no-ops (Phi_i = I, Qi = 0), so XLA
    sees one straight-line fusable graph. Rotation re-orthonormalization
    is deferred to the caller (once per frame).

    Returns (X', Phi (m,m), Qacc (m,m)).
    """
    dtype = X.Tsb.dtype
    m = L.MOTION
    g = jnp.asarray(cfg.gravity, dtype)
    Qimu = jnp.asarray(
        (list(cfg.Qimu_gyro) + list(cfg.Qimu_accel)
         + list(cfg.Qimu_gyro_bias) + list(cfg.Qimu_accel_bias)), dtype)
    Qimu = jnp.diag(Qimu ** 2)
    h0 = cfg.stepsize
    S = cfg.fast_substeps
    eye = jnp.eye(m, dtype=dtype)

    n = jnp.clip(jnp.ceil(dt / h0).astype(jnp.int32), 1, S)
    h_act = dt / n.astype(dtype)

    Xc, Phi, Q = X, eye, jnp.zeros((m, m), dtype)
    gy, ac = gyro0, accel0
    for k in range(S):
        h = jnp.where(k < n, h_act, jnp.zeros((), dtype))
        gy_m = gy + sg * (0.5 * h)
        ac_m = ac + sa * (0.5 * h)
        Xm = compose_motion(Xc, Xc.Vsb, gy_m, ac_m, 0.5 * h, g,
                            project=False)
        F, G = motion_jacobians(Xm, gy_m, ac_m, g, dtype)
        Xc = compose_motion(Xc, Xm.Vsb, gy_m, ac_m, h, g, project=False)
        Fh = F * h
        Phi_i = eye + Fh + 0.5 * (Fh @ Fh)
        Phi = Phi_i @ Phi
        Q = Phi_i @ Q @ Phi_i.T + (G @ Qimu @ G.T) * h
        gy = gy + sg * h
        ac = ac + sa * h
    return Xc, Phi, Q


def oc_correct_phi(cfg: VIOConfig, Phi, X_new: MotionState, oc_R, oc_V,
                   oc_T, Rsg):
    """Observability-constrained transition correction (OC-EKF).

    Enforces that the yaw-about-gravity unobservable direction propagates
    EXACTLY along the prior-estimate chain: with n_k = (R̆_kᵀ ĝ,
    ĝ×T̆_k, ĝ×V̆_k, 0, ...) the body-frame right-multiplicative error
    representation of a global rotation about gravity, require
    Phi* n_k = n_{k+1} and modify only the W-columns of the W/T/V rows,
    each by the minimum-Frobenius-norm row update
    A* = A − (A u − w) uᵀ/(uᵀu)  (Hesch et al., "Consistency analysis
    and improvement of vision-aided inertial navigation", TRO'13 —
    an improvement over the reference, which has no consistency
    machinery; the measurement-side counterpart is use_fej).

    (R̆, V̆, T̆) are the PRIOR estimates: oc_* from the previous frame's
    end-of-propagation, X_new from this frame's (pre-update). The
    translation nullspace is exact in Phi already (Phi_TT = I, groups do
    not propagate), so only the yaw direction needs correction.
    """
    dtype = Phi.dtype
    g0 = jnp.asarray(cfg.gravity, dtype)
    gs = Rsg @ g0
    ghat = gs / (jnp.linalg.norm(gs) + 1e-20)
    u = oc_R.T @ ghat
    uu = u @ u + 1e-20
    hg = so3.hat(ghat)
    W, T, V = L.WSB, L.TSB, L.VSB

    def fix(A, w):
        return A - jnp.outer(A @ u - w, u) / uu

    Phi = Phi.at[W:W + 3, W:W + 3].set(
        fix(Phi[W:W + 3, W:W + 3], X_new.Rsb.T @ ghat))
    wV = hg @ X_new.Vsb - Phi[V:V + 3, V:V + 3] @ (hg @ oc_V)
    Phi = Phi.at[V:V + 3, W:W + 3].set(fix(Phi[V:V + 3, W:W + 3], wV))
    wT = (hg @ X_new.Tsb - Phi[T:T + 3, T:T + 3] @ (hg @ oc_T)
          - Phi[T:T + 3, V:V + 3] @ (hg @ oc_V))
    Phi = Phi.at[T:T + 3, W:W + 3].set(fix(Phi[T:T + 3, W:W + 3], wT))
    return Phi


def propagate_state(cfg: VIOConfig, s: VIOState, dt, is_visual: bool):
    """Full-state propagation for one measurement interval.

    Mirrors Estimator::Propagate (src/estimator.cpp:539-592): on an IMU
    sample the slopes have already been refreshed by the caller; on a
    visual measurement the last IMU inputs are extrapolated with the
    stored slopes. Adds Qmodel to the motion block afterwards.
    """
    dtype = s.P.dtype
    m = L.MOTION
    Pmm = s.P[:m, :m]
    Pms = s.P[:m, m:]
    X, Pmm, Pms = propagate_interval(
        cfg, s.X, Pmm, Pms, s.last_gyro, s.last_accel,
        s.slope_gyro, s.slope_accel, dt)

    # Qmodel: extra process noise on Wsb/Wbc/Wsg (src/estimator.cpp:590)
    qm = jnp.zeros((m,), dtype)
    qm = qm.at[L.WSB:L.WSB + 3].set(cfg.Qmodel_Wsb ** 2)
    qm = qm.at[L.WBC:L.WBC + 3].set(cfg.Qmodel_Wbc ** 2)
    if cfg.Qmodel_Tbc > 0:    # static guard: keep the default jaxpr
        qm = qm.at[L.TBC:L.TBC + 3].set(cfg.Qmodel_Tbc ** 2)
    qm = qm.at[L.WSG:L.WSG + 2].set(cfg.Qmodel_Wsg ** 2)
    Pmm = Pmm + jnp.diag(qm)

    P = s.P.at[:m, :m].set(Pmm)
    P = P.at[:m, m:].set(Pms)
    P = P.at[m:, :m].set(Pms.T)

    last_gyro = s.last_gyro + s.slope_gyro * dt
    last_accel = s.last_accel + s.slope_accel * dt
    return s._replace(X=X, P=P, last_gyro=last_gyro, last_accel=last_accel)


def imu_sample_update(cfg: VIOConfig, s: VIOState, gyro, accel, dt):
    """Process one IMU sample arriving dt after the previous measurement.

    Updates the interpolation slopes then propagates (the reference's
    InertialMeasInternal -> Propagate(false) path,
    src/estimator.cpp:523-577). dt == 0 is a no-op (masked padding).
    Per-axis signal clamping (src/estimator.cpp:488-507) is applied
    here when ``clamp_signals`` so every ingestion path (scan, batch,
    streaming) gets it.
    """
    if cfg.clamp_signals:
        mg = jnp.asarray(cfg.max_gyro, gyro.dtype)
        ma = jnp.asarray(cfg.max_accel, accel.dtype)
        gyro = jnp.clip(gyro, -mg, mg)
        accel = jnp.clip(accel, -ma, ma)

    def do(s):
        safe_dt = jnp.maximum(dt, 1e-12)
        sg = (gyro - s.last_gyro) / safe_dt
        sa = (accel - s.last_accel) / safe_dt
        s = s._replace(slope_gyro=sg.astype(s.P.dtype),
                       slope_accel=sa.astype(s.P.dtype))
        return propagate_state(cfg, s, dt, is_visual=False)

    return jax.lax.cond(dt > 0, do, lambda s: s, s)
