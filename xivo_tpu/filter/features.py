"""Per-feature geometry: parametrization, prediction, subfilter, Jacobians.

All functions operate on ONE feature and are ``vmap``-ed over the track
table by the caller — the TPU replacement for the reference's per-feature
virtual calls (``src/feature.cpp``). Parity targets cited per function.

Local parametrization (log-depth): x = (X/Z, Y/Z, log Z) in the REFERENCE
group's camera frame (``src/feature.h:258-262``, ``common/project.h:62-95``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..geom import so3
from . import layout as L


def unproject_logz(x):
    """(X/Z, Y/Z, log Z) -> Xc, with 3x3 Jacobian (common/project.h:80-95)."""
    z = jnp.exp(x[2])
    Xc = jnp.array([x[0] * z, x[1] * z, z])
    J = jnp.array([[z, 0.0, x[0] * z],
                   [0.0, z, x[1] * z],
                   [0.0, 0.0, z]])
    return Xc, J


def project_logz(Xc):
    """Xc -> (X/Z, Y/Z, log Z), with 3x3 Jacobian (common/project.h:62-76)."""
    iz = 1.0 / Xc[2]
    x = jnp.array([Xc[0] * iz, Xc[1] * iz, jnp.log(Xc[2])])
    J = jnp.array([[iz, 0.0, -Xc[0] * iz * iz],
                   [0.0, iz, -Xc[1] * iz * iz],
                   [0.0, 0.0, iz]])
    return x, J


def project_persp(Xc):
    """Xc -> (X/Z, Y/Z) with 2x3 Jacobian (common/project.h:11-25)."""
    iz = 1.0 / Xc[2]
    xc = Xc[:2] * iz
    J = jnp.array([[iz, 0.0, -Xc[0] * iz * iz],
                   [0.0, iz, -Xc[1] * iz * iz]])
    return xc, J


class JacRow(NamedTuple):
    """One feature's 2-row measurement Jacobian, split by block."""
    J_motion: jnp.ndarray  # (2, MOTION) — Wsb/Tsb/Wbc/Tbc/td/Cg/bg columns
    J_cam: jnp.ndarray     # (2, NCAM)
    J_group: jnp.ndarray   # (2, 6) w.r.t. reference-group pose
    J_feat: jnp.ndarray    # (2, 3) w.r.t. local feature state
    inn: jnp.ndarray       # (2,) innovation (measured - predicted)
    xp_pred: jnp.ndarray   # (2,) predicted pixel


def compute_jacobian(cam_kind: int, intrin, X, Rsbr, Tsbr, x, xp_meas,
                     gyro, online_camera_calib: bool):
    """Closed-form measurement Jacobian chain for an instate feature.

    Exact port of the frame chain Xc -> Xbr -> Xs -> Xb -> Xcn -> pixel of
    ``Feature::ComputeJacobian`` (src/feature.cpp:542-656), including the
    temporal-calibration blocks w.r.t. td / Cg / bg. Validated against
    autodiff through the retraction in tests/test_jacobians.py.
    """
    Rsb, Tsb, Rbc, Tbc = X.Rsb, X.Tsb, X.Rbc, X.Tbc
    Rsb_t, Rbc_t = Rsb.T, Rbc.T

    Xc, dXc_dx = unproject_logz(x)
    Xbr = Rbc @ Xc + Tbc
    Xs = Rsbr @ Xbr + Tsbr
    Xb = Rsb_t @ (Xs - Tsb)
    Xcn = Rbc_t @ (Xb - Tbc)

    dXbr_dXc = Rbc
    dXbr_dWbc = -Rbc @ so3.hat(Xc)
    dXs_dXbr = Rsbr
    dXs_dWsbr = -Rsbr @ so3.hat(Xbr)
    dXb_dXs = Rsb_t
    dXb_dTsb = -Rsb_t
    dXb_dWsb = so3.hat(Xb)
    dXcn_dXb = Rbc_t

    dXcn_dXs = dXcn_dXb @ dXb_dXs
    dXcn_dTbc = -Rbc_t + dXcn_dXs @ dXs_dXbr            # dXbr_dTbc = I
    dXcn_dWbc = so3.hat(Xcn) + dXcn_dXs @ dXs_dXbr @ dXbr_dWbc
    dXcn_dTsb = dXcn_dXb @ dXb_dTsb
    dXcn_dWsb = dXcn_dXb @ dXb_dWsb
    dXcn_dTsbr = dXcn_dXs                                # dXs_dTsbr = I
    dXcn_dWsbr = dXcn_dXs @ dXs_dWsbr
    dXcn_dx = dXcn_dXs @ dXs_dXbr @ dXbr_dXc @ dXc_dx

    # temporal-calibration blocks (src/feature.cpp:593-609)
    gyro_calib = X.Cg @ gyro - X.bg
    dXcn_dtd = -Rbc_t @ (so3.hat(gyro_calib) @ Rsb_t @ (Xs - Tsb)
                         + Rsb_t @ X.Vsb)
    dXcn_dW = so3.dAB_dB(Rbc_t @ so3.hat(Rsb_t @ (Xs - Tsb)) * X.td, 3, 1)
    dW_dCg = (jnp.eye(3, dtype=x.dtype)[:, :, None]
              * gyro[None, None, :]).reshape(3, 9)
    dXcn_dCg = dXcn_dW @ dW_dCg
    dXcn_dbg = -dXcn_dW

    xcn, dxcn_dXcn = project_persp(Xcn)
    xp_pred, dxp_dxcn, dxp_dintrin = cam_mod.project_with_jac(
        cam_kind, intrin, xcn)
    dxp_dXcn = dxp_dxcn @ dxcn_dXcn

    # block concatenation in layout order (Wsb Tsb Vsb bg ba Wbc Tbc Wsg
    # td Cg Ca) — `.at[].set` block writes each cost a full-matrix copy
    # per write on TPU when vmapped over the slot table
    Z23 = jnp.zeros((2, 3), x.dtype)
    Jm = jnp.concatenate([
        dxp_dXcn @ dXcn_dWsb, dxp_dXcn @ dXcn_dTsb, Z23,     # Wsb Tsb Vsb
        dxp_dXcn @ dXcn_dbg, Z23,                            # bg ba
        dxp_dXcn @ dXcn_dWbc, dxp_dXcn @ dXcn_dTbc,          # Wbc Tbc
        jnp.zeros((2, 2), x.dtype),                          # Wsg
        (dxp_dXcn @ dXcn_dtd)[:, None],                      # td
        dxp_dXcn @ dXcn_dCg,                                 # Cg
        jnp.zeros((2, 6), x.dtype)], axis=1)                 # Ca

    J_cam = dxp_dintrin if online_camera_calib else jnp.zeros_like(dxp_dintrin)
    J_group = jnp.concatenate([dxp_dXcn @ dXcn_dWsbr,
                               dxp_dXcn @ dXcn_dTsbr], axis=1)
    J_feat = dxp_dXcn @ dXcn_dx

    return JacRow(J_motion=Jm, J_cam=J_cam, J_group=J_group, J_feat=J_feat,
                  inn=xp_meas - xp_pred, xp_pred=xp_pred)


def predict_pixel(cam_kind: int, intrin, X, Rsbr, Tsbr, x):
    """Reproject a feature into the current frame (Feature::Predict)."""
    Xc, _ = unproject_logz(x)
    Xs = Rsbr @ (X.Rbc @ Xc + X.Tbc) + Tsbr
    Xb = X.Rsb.T @ (Xs - X.Tsb)
    Xcn = X.Rbc.T @ (Xb - X.Tbc)
    xcn, _ = project_persp(Xcn)
    return cam_mod.project(cam_kind, intrin, xcn), Xcn[2]


def _inv2(S):
    """Closed-form 2x2 inverse (adjugate / determinant)."""
    det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
    adj = jnp.array([[S[1, 1], -S[0, 1]], [-S[1, 0], S[0, 0]]])
    return adj / det


def subfilter_update(cam_kind: int, intrin, X, Rsbr, Tsbr, x, Psub, xp_meas,
                     Rtri: float, MH_thresh: float):
    """Per-feature 3-dim depth subfilter EKF step.

    Port of Feature::SubfilterUpdate (src/feature.cpp:246-297): predicted
    reprojection, MH-ratio-based R inflation, Kalman update in Joseph form.
    Returns (x', Psub', outlier_increment).
    """
    Xc, dXc_dx = unproject_logz(x)
    # g(curr cam <- ref cam) = (gsb gbc)^-1 (gsbr gbc)
    Rcs = (X.Rsb @ X.Rbc).T
    Tcs = -Rcs @ (X.Rsb @ X.Tbc + X.Tsb)
    Rtot = Rcs @ (Rsbr @ X.Rbc)
    Ttot = Rcs @ (Rsbr @ X.Tbc + Tsbr) + Tcs
    Xcn = Rtot @ Xc + Ttot
    xcn, dxcn_dXcn = project_persp(Xcn)
    xp_pred, dxp_dxcn, _ = cam_mod.project_with_jac(cam_kind, intrin, xcn)

    H = dxp_dxcn @ dxcn_dXcn @ Rtot @ dXc_dx   # (2,3)
    inn = xp_meas - xp_pred

    S = H @ Psub @ H.T
    S = S + Rtri * jnp.eye(2, dtype=x.dtype)
    # MH ratio with threshold; inflate R when suspicious.
    # closed-form 2x2 inverse: jnp.linalg.inv lowers to an (expensive,
    # serialized) LU custom-call on TPU — measured 9 ms/frame-batch each
    ratio = inn @ (_inv2(S) @ inn) / MH_thresh
    bad = ratio > 1.0
    S = S + jnp.where(bad, Rtri * (ratio - 1.0), 0.0) * jnp.eye(2, dtype=x.dtype)
    outlier_inc = jnp.where(bad, jnp.sqrt(jnp.maximum(ratio, 0.0)), 0.0)

    K = Psub @ H.T @ _inv2(S)
    x_new = x + K @ inn
    I_KH = jnp.eye(3, dtype=x.dtype) - K @ H
    P_new = I_KH @ Psub @ I_KH.T + Rtri * (K @ K.T)
    return x_new, P_new, outlier_inc, bad


# ---------------------------------------------------------------------------
# SoA "plane" algebra: small fixed-size matrices represented as nested
# Python lists of (N,)-shaped arrays (one plane per entry). On TPU,
# einsum/vmap over (N,3,3) arrays lowers to dot_generals whose 3-sized
# contraction dims pad to the (8,128) tile — measured ~100x slower than
# the same math as elementwise plane ops. The per-feature subfilter runs
# over the whole table in this form.


def _pm(M):
    """(..., r, c) array -> plane-matrix (list of lists of (...,) arrays)."""
    r, c = M.shape[-2], M.shape[-1]
    return [[M[..., i, j] for j in range(c)] for i in range(r)]


def _pv(v):
    return [v[..., i] for i in range(v.shape[-1])]


def _pm_mm(A, B):
    """Plane-matrix product."""
    r, k, c = len(A), len(B), len(B[0])
    return [[sum(A[i][t] * B[t][j] for t in range(k)) for j in range(c)]
            for i in range(r)]


def _pm_mv(A, v):
    return [sum(A[i][t] * v[t] for t in range(len(v))) for i in range(len(A))]


def _pm_T(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _pm_stack(A):
    """Plane-matrix -> (..., r, c) array."""
    return jnp.stack([jnp.stack([jnp.asarray(e) for e in row], axis=-1)
                      for row in A], axis=-2)


def subfilter_update_table(cam_kind: int, intrin, X, Rsbr, Tsbr, x, Psub,
                           xp_meas, Rtri: float, MH_thresh: float):
    """SoA version of ``subfilter_update`` over the whole feature table.

    Same math as the per-feature form (Feature::SubfilterUpdate,
    src/feature.cpp:246-297), but every 3x3/2x2 product is expanded into
    elementwise ops over (N,) planes so nothing lowers to padded tiny
    dot_generals. Shapes: Rsbr (N,3,3), Tsbr (N,3), x (N,3),
    Psub (N,3,3), xp_meas (N,2). Returns (x' (N,3), Psub' (N,3,3),
    outlier_inc (N,), bad (N,)).
    """
    dt = x.dtype
    x0, x1, x2 = x[:, 0], x[:, 1], x[:, 2]
    z = jnp.exp(x2)
    Xc = [x0 * z, x1 * z, z]
    zero = jnp.zeros((), dt)
    dXc_dx = [[z, zero, x0 * z],
              [zero, z, x1 * z],
              [zero, zero, z]]

    Rsb, Tsb = _pm(X.Rsb), _pv(X.Tsb)
    Rbc, Tbc = _pm(X.Rbc), _pv(X.Tbc)
    Rsbr_p, Tsbr_p = _pm(Rsbr), _pv(Tsbr)

    Rcs = _pm_T(_pm_mm(Rsb, Rbc))
    Tcs = [-t for t in _pm_mv(Rcs, [a + b for a, b in
                                    zip(_pm_mv(Rsb, Tbc), Tsb)])]
    Rtot = _pm_mm(Rcs, _pm_mm(Rsbr_p, Rbc))
    Ttot = [a + b for a, b in zip(
        _pm_mv(Rcs, [a + b for a, b in zip(_pm_mv(Rsbr_p, Tbc), Tsbr_p)]),
        Tcs)]
    Xcn = [a + b for a, b in zip(_pm_mv(Rtot, Xc), Ttot)]

    iz = 1.0 / Xcn[2]
    xcn0, xcn1 = Xcn[0] * iz, Xcn[1] * iz
    dxcn_dXcn = [[iz, zero, -Xcn[0] * iz * iz],
                 [zero, iz, -Xcn[1] * iz * iz]]

    xcn = jnp.stack([xcn0, xcn1], axis=-1)
    xp_pred, dxp, _ = jax.vmap(
        lambda v: cam_mod.project_with_jac(cam_kind, intrin, v))(xcn)
    dxp_p = _pm(dxp)

    H = _pm_mm(_pm_mm(dxp_p, dxcn_dXcn), _pm_mm(Rtot, dXc_dx))   # 2x3
    inn = [xp_meas[:, 0] - xp_pred[:, 0], xp_meas[:, 1] - xp_pred[:, 1]]

    P = _pm(Psub)
    PHt = _pm_mm(P, _pm_T(H))                                    # 3x2
    S = _pm_mm(H, PHt)                                           # 2x2
    S[0][0] = S[0][0] + Rtri
    S[1][1] = S[1][1] + Rtri

    def inv2(S):
        det = S[0][0] * S[1][1] - S[0][1] * S[1][0]
        return [[S[1][1] / det, -S[0][1] / det],
                [-S[1][0] / det, S[0][0] / det]]

    Si = inv2(S)
    Sinn = _pm_mv(Si, inn)
    ratio = (inn[0] * Sinn[0] + inn[1] * Sinn[1]) / MH_thresh
    bad = ratio > 1.0
    infl = jnp.where(bad, Rtri * (ratio - 1.0), 0.0)
    S[0][0] = S[0][0] + infl
    S[1][1] = S[1][1] + infl
    outlier_inc = jnp.where(bad, jnp.sqrt(jnp.maximum(ratio, 0.0)), 0.0)

    K = _pm_mm(PHt, inv2(S))                                     # 3x2
    x_new = jnp.stack([xi + ki for xi, ki in
                       zip([x0, x1, x2], _pm_mv(K, inn))], axis=-1)
    KH = _pm_mm(K, H)                                            # 3x3
    one = jnp.ones((), dt)
    I_KH = [[(one if i == j else zero) - KH[i][j] for j in range(3)]
            for i in range(3)]
    P_new = _pm_mm(_pm_mm(I_KH, P), _pm_T(I_KH))
    KKt = _pm_mm(K, _pm_T(K))
    P_new = [[P_new[i][j] + Rtri * KKt[i][j] for j in range(3)]
             for i in range(3)]
    shaped = jnp.broadcast_to(zero, x0.shape)
    P_new = [[e + shaped for e in row] for row in P_new]
    return x_new, _pm_stack(P_new), outlier_inc, bad


def triangulate_two_view(g12_R, g12_T, xc1, xc2, method: str = "dlt_avg"):
    """Two-view triangulation of Xc1 given calibrated rays.

    g12 = transform from camera-2 coords to camera-1 coords (pose of cam2
    in cam1), unit-plane coords xc1/xc2. Methods mirror src/helpers.cpp:
    DLT-SVD / DLT-avg / L1-angular.
    Returns Xc1 (3,) — caller range-checks depth.
    """
    if method in ("direct_linear_transform_avg", "dlt_avg"):
        # midpoint of closest points on the two rays
        d1 = jnp.array([xc1[0], xc1[1], 1.0])
        d2g = g12_R @ jnp.array([xc2[0], xc2[1], 1.0])
        o2 = g12_T
        a = d1 @ d1
        b = d1 @ d2g
        c = d2g @ d2g
        d = d1 @ o2
        e = d2g @ o2
        den = a * c - b * b
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        t1 = (c * d - b * e) / den
        t2 = (b * d - a * e) / den
        return 0.5 * (t1 * d1 + (o2 + t2 * d2g))
    if method in ("direct_linear_transform_svd", "dlt_svd"):
        # rows of A from the two projections; solve A X_h = 0
        R21 = g12_R.T
        T21 = -R21 @ g12_T
        P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P2 = jnp.concatenate([R21, T21[:, None]], axis=1)
        A = jnp.stack([
            xc1[0] * P1[2] - P1[0],
            xc1[1] * P1[2] - P1[1],
            xc2[0] * P2[2] - P2[0],
            xc2[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        Xh = vt[-1]
        return Xh[:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])
    X, _ = _triangulate_angular(g12_R, g12_T, xc1, xc2, method,
                                max_theta_thresh=jnp.pi, beta_thresh=0.0)
    return X


def _triangulate_angular(g12_R, g12_T, xc1, xc2, method,
                         max_theta_thresh, beta_thresh):
    """Optimal angular two-view triangulation (Lee & Civera, ICCV'17).

    Mirrors L1Angular / L2Angular / LinfAngular (src/helpers.cpp:156-371):
    rotate the reference ray into the second frame, correct the rays onto a
    common epipolar plane with normal chosen per the L1/L2/Linf criterion,
    intersect, and map back to the reference (cam-1) frame. Returns
    ``(Xc1, ok)`` with ok = cheirality ∧ angular-reprojection ∧ parallax
    (src/helpers.cpp:357-371 check_* trio). One deliberate deviation: the
    reference's LinfAngular forgets to normalize ``n_prime_hat``
    (src/helpers.cpp:300) making its ray "projection" scale-dependent; we
    normalize (the paper's correct form).
    """
    eps = 1e-20
    # frame mapping: our cam1 (reference obs) = the paper's frame 0, our
    # cam2 (current obs) = frame 1; all corrections happen in frame 1.
    R10 = g12_R.T
    t10 = -(R10 @ g12_T)
    f0 = jnp.array([xc1[0], xc1[1], 1.0])
    f0 = f0 / (jnp.linalg.norm(f0) + eps)
    f1 = jnp.array([xc2[0], xc2[1], 1.0])
    f1 = f1 / (jnp.linalg.norm(f1) + eps)
    m0 = R10 @ f0
    m1 = f1

    def _unit(v):
        return v / (jnp.linalg.norm(v) + eps)

    if method == "l1_angular":
        # correct only the ray with the smaller sine-of-angle to t10,
        # projecting it onto the other ray's epipolar plane
        a0 = jnp.linalg.norm(jnp.cross(_unit(m0), t10))
        a1 = jnp.linalg.norm(jnp.cross(_unit(m1), t10))
        n0 = _unit(jnp.cross(m0, t10))
        n1 = _unit(jnp.cross(m1, t10))
        fix0 = a0 <= a1
        m0p = jnp.where(fix0, m0 - (m0 @ n1) * n1, m0)
        m1p = jnp.where(fix0, m1, m1 - (m1 @ n0) * n0)
    elif method == "l2_angular":
        # plane normal = second right-singular vector of
        # B = [m0_hat m1_hat]^T (I - t10_hat t10_hat^T)
        # (src/helpers.cpp:238-250). t10_hat is an EXACT null vector of B,
        # so V.col(1) is B's smallest singular direction within the plane
        # perpendicular to t10 — computed here closed-form by restricting B
        # to an orthonormal basis {e1,e2} of that plane and taking the
        # smallest eigenvector of the 2x2 normal matrix (degenerate-safe
        # where a generic 3x3 eigh is not: noise-free data makes
        # {t10_hat, n} a TWO-dimensional nullspace).
        t10_hat = _unit(t10)
        seed = jnp.where(jnp.abs(t10_hat[0]) < 0.9,
                         jnp.array([1.0, 0.0, 0.0], t10.dtype),
                         jnp.array([0.0, 1.0, 0.0], t10.dtype))
        e1 = _unit(jnp.cross(t10_hat, seed))
        e2 = jnp.cross(t10_hat, e1)
        A = jnp.stack([_unit(m0), _unit(m1)])            # (2,3) rows
        C = A @ jnp.stack([e1, e2], axis=1)              # (2,2)
        M = C.T @ C
        a, b, c = M[0, 0], M[0, 1], M[1, 1]
        lam_min = 0.5 * (a + c) - jnp.sqrt(0.25 * (a - c) ** 2 + b * b)
        # eigenvector of the smaller eigenvalue, branchless conditioning
        v_a = jnp.stack([b, lam_min - a])
        v_b = jnp.stack([lam_min - c, b])
        w = jnp.where(jnp.linalg.norm(v_a) >= jnp.linalg.norm(v_b), v_a, v_b)
        # b ~ 0 and a ~ c makes both candidates vanish; fall back to the
        # axis of the smaller diagonal entry
        w = jnp.where(jnp.linalg.norm(w) < eps,
                      jnp.where(a <= c, jnp.array([1.0, 0.0], M.dtype),
                                jnp.array([0.0, 1.0], M.dtype)), w)
        w = w / (jnp.linalg.norm(w) + eps)
        n_hat = w[0] * e1 + w[1] * e2
        m0p = m0 - (m0 @ n_hat) * n_hat
        m1p = m1 - (m1 @ n_hat) * n_hat
    elif method == "linf_angular":
        na = jnp.cross(_unit(m0) + _unit(m1), t10)
        nb = jnp.cross(_unit(m0) - _unit(m1), t10)
        n_hat = _unit(jnp.where(jnp.linalg.norm(na) >= jnp.linalg.norm(nb),
                                na, nb))
        m0p = m0 - (m0 @ n_hat) * n_hat
        m1p = m1 - (m1 @ n_hat) * n_hat
    else:
        raise ValueError(f"unknown triangulation method {method!r}")

    # shared tail (src/helpers.cpp:195-214): intersect corrected rays in
    # frame 1, then map to the reference frame
    z = jnp.cross(m1p, m0p)
    zn2 = z @ z + eps
    X1 = ((z @ jnp.cross(t10, m0p)) / zn2) * m1p
    X = g12_R @ X1 + g12_T

    lam0 = (z @ jnp.cross(t10, m1p)) / zn2
    lam1 = (z @ jnp.cross(t10, m0p)) / zn2
    cheirality = (lam0 > 0) & (lam1 > 0)

    def _angle(u, v):
        c = (u @ v) / ((jnp.linalg.norm(u) + eps) * (jnp.linalg.norm(v) + eps))
        return jnp.arccos(jnp.clip(c, -1.0, 1.0))

    max_theta = jnp.maximum(_angle(m0, m0p), _angle(m1, m1p))
    beta = _angle(m0p, m1p)
    ok = cheirality & (max_theta <= max_theta_thresh) & (beta >= beta_thresh)
    return X, ok


def triangulate_two_view_checked(g12_R, g12_T, xc1, xc2, method,
                                 max_theta_thresh, beta_thresh):
    """Triangulate and report validity.

    For the angular methods this applies the reference's cheirality /
    angular-reprojection / parallax checks (src/helpers.cpp:203-214 etc.);
    the DLT methods have no checks in the reference, so ok=True there and
    the caller's depth-range gate is the only filter.
    """
    if method in ("l1_angular", "l2_angular", "linf_angular"):
        return _triangulate_angular(g12_R, g12_T, xc1, xc2, method,
                                    max_theta_thresh, beta_thresh)
    X = triangulate_two_view(g12_R, g12_T, xc1, xc2, method)
    return X, jnp.asarray(True)


def change_owner(X, Rsbr_old, Tsbr_old, Rsbr_new, Tsbr_new, x, Psub):
    """Re-parametrize a feature to a new reference group.

    Port of Feature::ChangeOwner (src/feature.cpp:211-243). Returns
    (x', Psub', ok) where ok=False on negative depth.
    """
    Xc, dXc_dx = unproject_logz(x)
    # spatial position and its Jacobian w.r.t. local state
    Rsc_old = Rsbr_old @ X.Rbc
    Xs = Rsc_old @ Xc + Rsbr_old @ X.Tbc + Tsbr_old
    dXs_dx = Rsc_old @ dXc_dx
    # into the new reference camera
    Rsc_new = Rsbr_new @ X.Rbc
    Xcn = Rsc_new.T @ (Xs - (Rsbr_new @ X.Tbc + Tsbr_new))
    dXcn_dx = Rsc_new.T @ dXs_dx
    ok = Xcn[2] > 0
    zsafe = jnp.where(ok, Xcn[2], 1.0)
    Xcn_safe = Xcn.at[2].set(zsafe)
    xn, dxn_dXcn = project_logz(Xcn_safe)
    J = dxn_dXcn @ dXcn_dx
    return xn, J @ Psub @ J.T, ok
