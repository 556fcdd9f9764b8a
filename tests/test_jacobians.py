"""Measurement-Jacobian finite-difference tests.

The port of the reference's most important test
(src/test/unittest_jacobians_instate.cpp): perturb every error-state
block through the SAME retraction the filter uses, re-evaluate the
nominal measurement chain, and compare with the closed-form Jacobian of
``compute_jacobian``. The temporal block (td/Cg/bg coupling) is
exercised by composing the measurement-time pose shift
Rsb <- Rsb exp(hat(w td)), Tsb <- Tsb + Vsb td exactly as the reference
models it (src/feature.cpp:593-609).
"""
import jax.numpy as jnp
import numpy as np

from xivo_tpu import cam as cam_mod
from xivo_tpu.filter import layout as L
from xivo_tpu.filter.features import (compute_jacobian, project_persp,
                                      unproject_logz, subfilter_update,
                                      triangulate_two_view, change_owner)
from xivo_tpu.filter.retraction import (apply_group_error,
                                        apply_motion_error)
from xivo_tpu.filter.state import MotionState
from xivo_tpu.geom import so3

RNG = np.random.default_rng(7)


def make_scene():
    r = lambda n, s=1.0: jnp.asarray(RNG.standard_normal(n) * s)
    X = MotionState(
        Rsb=so3.exp(r(3, 0.4)), Tsb=r(3), Vsb=r(3), bg=0.02 * r(3),
        ba=0.05 * r(3), Rbc=so3.exp(jnp.asarray([-1.4, 0.1, 0.05])),
        Tbc=0.05 * r(3), Rsg=so3.exp(jnp.asarray([0.02, -0.01, 0.0])),
        td=jnp.asarray(0.004), Cg=jnp.eye(3) + 0.01 * r((3, 3)),
        Ca=jnp.triu(jnp.eye(3) + 0.01 * r((3, 3))))
    # reference group pose: near the body pose but distinct
    Rsbr = so3.exp(r(3, 0.3))
    Tsbr = X.Tsb + 0.3 * r(3)
    # a feature in front of the reference camera
    x = jnp.asarray([0.15, -0.08, np.log(2.3)])
    gyro = r(3, 0.5)
    kind, intrin, _ = cam_mod.intrinsics_from_cfg(
        dict(model="radtan", rows=480, cols=640, fx=300.0, fy=295.0,
             cx=320.0, cy=240.0, p1=0.0005, p2=-0.0004, k1=-0.2, k2=0.05,
             k3=-0.002))
    return X, Rsbr, Tsbr, x, gyro, kind, intrin


def measure(kind, intrin, X, Rsbr, Tsbr, x, gyro, td0, w0):
    """Nominal measurement with explicit measurement-time pose shift."""
    w = X.Cg @ gyro - X.bg
    # deviation of the accumulated shift from its linearization point
    dshift = w * X.td - w0 * td0
    Rsb_eff = X.Rsb @ so3.exp(dshift)
    Tsb_eff = X.Tsb + X.Vsb * (X.td - td0)
    Xc, _ = unproject_logz(x)
    Xs = Rsbr @ (X.Rbc @ Xc + X.Tbc) + Tsbr
    Xb = Rsb_eff.T @ (Xs - Tsb_eff)
    Xcn = X.Rbc.T @ (Xb - X.Tbc)
    xcn, _ = project_persp(Xcn)
    return cam_mod.project(kind, intrin, xcn)


def test_instate_jacobian_fd():
    X, Rsbr, Tsbr, x, gyro, kind, intrin = make_scene()
    td0 = X.td
    w0 = X.Cg @ gyro - X.bg
    xp_meas = measure(kind, intrin, X, Rsbr, Tsbr, x, gyro, td0, w0)
    row = compute_jacobian(kind, intrin, X, Rsbr, Tsbr, x, xp_meas, gyro,
                           online_camera_calib=True)
    # innovation at the nominal point is zero
    assert np.allclose(row.inn, 0.0, atol=1e-10)

    eps = 1e-6

    def fd(block, i, which):
        """FD of the measurement w.r.t. error entry i of a block."""
        def val(sign):
            if which == "motion":
                err = jnp.zeros(L.MOTION).at[block + i].set(sign * eps)
                Xp = apply_motion_error(X, err)
                return measure(kind, intrin, Xp, Rsbr, Tsbr, x, gyro, td0, w0)
            if which == "group":
                err = jnp.zeros(6).at[i].set(sign * eps)
                Rp, Tp = apply_group_error(Rsbr, Tsbr, err)
                return measure(kind, intrin, X, Rp, Tp, x, gyro, td0, w0)
            if which == "feat":
                xpert = x.at[i].add(sign * eps)
                return measure(kind, intrin, X, Rsbr, Tsbr, xpert, gyro,
                               td0, w0)
            err = jnp.zeros(cam_mod.MAX_INTRINSICS).at[i].set(sign * eps)
            return measure(kind, intrin + err, X, Rsbr, Tsbr, x, gyro,
                           td0, w0)
        return (val(+1) - val(-1)) / (2 * eps)

    # note J = d(pred)/d(err) appears negated in inn = meas - pred; the
    # reference stores J of the *prediction*, so compare against -d inn
    checks = [
        ("motion", L.WSB, 3), ("motion", L.TSB, 3), ("motion", L.WBC, 3),
        ("motion", L.TBC, 3), ("motion", L.TD, 1), ("motion", L.CG, 9),
        ("motion", L.BG, 3),
    ]
    for which, off, n in checks:
        for i in range(n):
            num = fd(off, i, "motion")
            ana = row.J_motion[:, off + i]
            assert np.allclose(ana, num, atol=2e-4), (which, off, i, ana, num)
    for i in range(6):
        assert np.allclose(row.J_group[:, i], fd(0, i, "group"), atol=2e-4), i
    for i in range(3):
        assert np.allclose(row.J_feat[:, i], fd(0, i, "feat"), atol=2e-4), i
    for i in range(cam_mod.MODEL_DIM[kind]):
        assert np.allclose(row.J_cam[:, i], fd(0, i, "cam"), atol=1e-4), i


def test_subfilter_converges_depth():
    # fixed scene: a feature at known depth; repeated subfilter updates
    # from a second viewpoint must pull log-depth toward the truth
    X, Rsbr, Tsbr, x_true, gyro, kind, intrin = make_scene()
    Xc, _ = unproject_logz(x_true)
    # exact measurement from the current camera pose
    Xs = Rsbr @ (X.Rbc @ Xc + X.Tbc) + Tsbr
    Xb = X.Rsb.T @ (Xs - X.Tsb)
    Xcn = X.Rbc.T @ (Xb - X.Tbc)
    xcn, _ = project_persp(Xcn)
    xp_meas = cam_mod.project(kind, intrin, xcn)

    x = x_true.at[2].set(np.log(1.0))  # wrong initial depth
    Psub = jnp.diag(jnp.asarray([1e-4, 1e-4, 0.5]))
    err0 = abs(float(x[2] - x_true[2]))
    P0 = float(Psub[2, 2])
    for _ in range(30):
        x, Psub, inc, bad = subfilter_update(
            kind, intrin, X, Rsbr, Tsbr, x, Psub, xp_meas,
            Rtri=3.5 ** 2, MH_thresh=8.991)
    err1 = abs(float(x[2] - x_true[2]))
    # repeated identical views shrink both the error and the depth variance
    # (the MH-based R inflation throttles early large-innovation steps, so
    # convergence is gradual by design — src/feature.cpp:266-287)
    assert err1 < err0 * 0.7
    assert float(Psub[2, 2]) < P0


def test_triangulation_methods():
    # known geometry: point at (0.3, -0.2, 2.0) in cam1; cam2 translated
    Xc1 = np.array([0.3, -0.2, 2.0])
    R12 = np.asarray(so3.exp(jnp.asarray([0.02, 0.3, -0.01])))
    T12 = np.array([0.5, 0.05, 0.1])
    # cam2 sees the point at
    Xc2 = R12.T @ (Xc1 - T12)
    xc1 = jnp.asarray(Xc1[:2] / Xc1[2])
    xc2 = jnp.asarray(Xc2[:2] / Xc2[2])
    for method in ("dlt_avg", "dlt_svd", "l1_angular", "l2_angular",
                   "linf_angular"):
        out = triangulate_two_view(jnp.asarray(R12), jnp.asarray(T12),
                                   xc1, xc2, method)
        assert np.allclose(out, Xc1, atol=1e-7), (method, out)


def test_triangulation_checks():
    # noise-free geometry passes all checks; behind-camera point fails
    # cheirality; near-zero parallax fails the beta check
    from xivo_tpu.filter.features import triangulate_two_view_checked
    Xc1 = np.array([0.3, -0.2, 2.0])
    R12 = np.asarray(so3.exp(jnp.asarray([0.02, 0.3, -0.01])))
    T12 = np.array([0.5, 0.05, 0.1])
    Xc2 = R12.T @ (Xc1 - T12)
    xc1 = jnp.asarray(Xc1[:2] / Xc1[2])
    xc2 = jnp.asarray(Xc2[:2] / Xc2[2])
    for method in ("l1_angular", "l2_angular", "linf_angular"):
        out, ok = triangulate_two_view_checked(
            jnp.asarray(R12), jnp.asarray(T12), xc1, xc2, method,
            max_theta_thresh=0.1 * np.pi / 180,
            beta_thresh=0.25 * np.pi / 180)
        assert bool(ok), method
        assert np.allclose(out, Xc1, atol=1e-7), (method, out)

    # cheirality: point behind camera 1
    Xb = np.array([0.1, 0.1, -2.0])
    Xb2 = R12.T @ (Xb - T12)
    _, ok = triangulate_two_view_checked(
        jnp.asarray(R12), jnp.asarray(T12),
        jnp.asarray(Xb[:2] / Xb[2]), jnp.asarray(Xb2[:2] / Xb2[2]),
        "l1_angular", max_theta_thresh=np.pi, beta_thresh=0.0)
    assert not bool(ok)

    # parallax: nearly-identical camera centers -> beta below threshold
    T_tiny = np.array([1e-6, 0.0, 0.0])
    Xc2t = R12.T @ (Xc1 - T_tiny)
    _, ok = triangulate_two_view_checked(
        jnp.asarray(R12), jnp.asarray(T_tiny), xc1,
        jnp.asarray(Xc2t[:2] / Xc2t[2]), "l2_angular",
        max_theta_thresh=np.pi, beta_thresh=0.25 * np.pi / 180)
    assert not bool(ok)


def test_huber_robustify_R():
    from xivo_tpu.filter.update import huber_robustify_R
    R = 2.0
    thresh = 1.1
    inn = jnp.asarray([0.1, -0.1,        # small block: untouched
                       10.0, 0.0])       # large block: inflated
    diagR = np.asarray(huber_robustify_R(inn, R, thresh, jnp.float64))
    assert np.allclose(diagR[:2], R)
    ratio = 100.0 / (2 * R) / thresh
    assert np.allclose(diagR[2:], R * np.sqrt(ratio))


def test_change_owner_roundtrip():
    X, Rsbr, Tsbr, x, gyro, kind, intrin = make_scene()
    Rsbn = np.asarray(so3.exp(jnp.asarray(RNG.standard_normal(3) * 0.2)))
    Tsbn = np.asarray(Tsbr) + RNG.standard_normal(3) * 0.2
    Psub = jnp.diag(jnp.asarray([1e-4, 1e-4, 0.1]))
    xn, Pn, ok = change_owner(X, Rsbr, Tsbr, jnp.asarray(Rsbn),
                              jnp.asarray(Tsbn), x, Psub)
    assert bool(ok)
    # same spatial point from both parametrizations
    Xc_old, _ = unproject_logz(x)
    Xs_old = Rsbr @ (X.Rbc @ Xc_old + X.Tbc) + Tsbr
    Xc_new, _ = unproject_logz(xn)
    Xs_new = jnp.asarray(Rsbn) @ (X.Rbc @ Xc_new + X.Tbc) + jnp.asarray(Tsbn)
    assert np.allclose(Xs_old, Xs_new, atol=1e-10)
    # and transferring back recovers the original local state
    xb, Pb, ok2 = change_owner(X, jnp.asarray(Rsbn), jnp.asarray(Tsbn),
                               Rsbr, Tsbr, xn, Pn)
    assert bool(ok2)
    assert np.allclose(xb, x, atol=1e-10)
    assert np.allclose(Pb, Psub, atol=1e-10)


def test_absorb_error_matches_retraction_helpers():
    """absorb_error inlines the stacked rotation retraction for speed; it
    must stay term-for-term identical to the canonical helpers in
    retraction.py (which the FD Jacobian tests perturb through)."""
    import jax.numpy as jnp
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.filter.retraction import (apply_group_error,
                                            apply_motion_error)
    from xivo_tpu.filter.update import absorb_error
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    s = init_state(cfg)
    # occupy a couple of group/feature slots so the one-hot routes hit
    gr = s.groups
    gr = gr._replace(sind=gr.sind.at[0].set(2).at[3].set(0),
                     gid=gr.gid.at[0].set(10).at[3].set(11))
    fr = s.features
    fr = fr._replace(sind=fr.sind.at[5].set(1), fid=fr.fid.at[5].set(7))
    s = s._replace(groups=gr, features=fr,
                   g2row=s.g2row.at[2].set(0).at[0].set(3),
                   f2row=s.f2row.at[1].set(5))

    rng = np.random.default_rng(3)
    err = jnp.asarray(rng.standard_normal(cfg.dims.full) * 1e-2)

    s2 = absorb_error(cfg, s, err)

    from xivo_tpu.filter import layout as L
    X_ref = apply_motion_error(s.X, err[:L.MOTION])
    for f in X_ref._fields:
        assert np.allclose(np.asarray(getattr(s2.X, f)),
                           np.asarray(getattr(X_ref, f)), atol=1e-14), f
    # group row 0 holds slot 2, row 3 holds slot 0
    for row, slot in [(0, 2), (3, 0)]:
        e6 = err[L.GROUP_BEGIN + 6 * slot:L.GROUP_BEGIN + 6 * slot + 6]
        Rr, Tr = apply_group_error(s.groups.Rsb[row], s.groups.Tsb[row], e6)
        assert np.allclose(np.asarray(s2.groups.Rsb[row]), np.asarray(Rr),
                           atol=1e-14)
        assert np.allclose(np.asarray(s2.groups.Tsb[row]), np.asarray(Tr),
                           atol=1e-14)
    # feature row 5 holds slot 1
    e3 = err[cfg.dims.feature_begin + 3:cfg.dims.feature_begin + 6]
    assert np.allclose(np.asarray(s2.features.x[5]),
                       np.asarray(s.features.x[5] + e3), atol=1e-14)
