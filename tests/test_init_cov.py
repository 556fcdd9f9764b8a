"""Correlated feature-initialization covariance (init_cov.py).

Reference capability: APPROXIMATE_INIT_COVARIANCE
(src/feature.cpp FillCovarianceBlock cross blocks). Contract here:
(1) the per-observation Jacobian blocks match the FD-validated
    measurement chain of features.compute_jacobian;
(2) the augmentation is exactly PSD e2e (congruence construction);
(3) accuracy is not degraded on the standard sim benchmark.
"""
import jax
import jax.numpy as jnp
import numpy as np

from xivo_tpu import cam as cam_mod
from xivo_tpu.filter import layout as L
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.features import compute_jacobian
from xivo_tpu.filter.init_cov import obs_jacobian
from xivo_tpu.filter.state import MotionState, init_state
from xivo_tpu.geom import so3
from tests.test_e2e_pcw import PCW_CFG, run_scan


def _rand_rot(rng, scale=0.5):
    return np.asarray(so3.exp(jnp.asarray(rng.standard_normal(3) * scale)))


def test_obs_jacobian_matches_validated_chain():
    """obs_jacobian == compute_jacobian with the observing group's pose
    substituted for the current body pose (td/gyro terms off)."""
    rng = np.random.default_rng(7)
    intrin = jnp.asarray([275.0, 270.0, 320.0, 240.0, 0, 0, 0, 0, 0])
    kind = cam_mod.MODEL_IDS["pinhole"]
    for _ in range(10):
        Rbc = jnp.asarray(_rand_rot(rng, 0.3))
        Tbc = jnp.asarray(rng.standard_normal(3) * 0.1)
        Rsbr = jnp.asarray(_rand_rot(rng))
        Tsbr = jnp.asarray(rng.standard_normal(3))
        Rg = jnp.asarray(_rand_rot(rng, 0.2))
        Tg = jnp.asarray(rng.standard_normal(3) * 0.3)
        x = jnp.asarray([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                         np.log(rng.uniform(1.5, 4.0))])
        Hx, Hc, Hg, Hr, Hcam, good = obs_jacobian(
            kind, intrin, Rbc, Tbc, Rsbr, Tsbr, Rg, Tg, x, jnp.float64)
        if not bool(good):
            continue
        X = MotionState(
            Rsb=Rg, Tsb=Tg, Vsb=jnp.zeros(3), bg=jnp.zeros(3),
            ba=jnp.zeros(3), Rbc=Rbc, Tbc=Tbc, Rsg=jnp.eye(3),
            td=jnp.asarray(0.0), Cg=jnp.eye(3), Ca=jnp.eye(3))
        jr = compute_jacobian(kind, intrin, X, Rsbr, Tsbr, x,
                              jnp.zeros(2), jnp.zeros(3),
                              online_camera_calib=True)
        np.testing.assert_allclose(Hx, jr.J_feat, atol=1e-9)
        np.testing.assert_allclose(
            Hc, jr.J_motion[:, L.WBC:L.WBC + 6], atol=1e-9)
        np.testing.assert_allclose(
            Hg[:, :3], jr.J_motion[:, L.WSB:L.WSB + 3], atol=1e-9)
        np.testing.assert_allclose(
            Hg[:, 3:], jr.J_motion[:, L.TSB:L.TSB + 3], atol=1e-9)
        np.testing.assert_allclose(Hr, jr.J_group, atol=1e-9)
        np.testing.assert_allclose(Hcam, jr.J_cam, atol=1e-9)


def test_e2e_psd_and_accuracy():
    """Flag-on e2e run: P stays PSD (congruence guarantee) and the
    trajectory is as accurate as the flag-off baseline."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           approximate_init_covariance=True)
    s, outs, gt = run_scan(cfg, total_time=6.0, noise_px=0.25)
    P = np.asarray(s.P)
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    ev = np.linalg.eigvalsh(P)
    assert ev[0] > -1e-9 * max(ev[-1], 1.0), ev[0]
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = np.sqrt(np.mean(err ** 2))
    assert rmse < 0.10, rmse
    assert int(outs.num_instate_features[-1]) > 10


def test_psd_through_heavy_churn():
    """Longer run with group retirement/gauge switches exercising the
    admission path repeatedly — min eigenvalue never goes negative."""
    cfg = config_from_json(
        PCW_CFG, dtype="float64", sim_initialize_depths=True,
        approximate_init_covariance=True)
    s, outs, gt = run_scan(cfg, total_time=12.0, noise_px=0.5)
    P = np.asarray(s.P)
    ev = np.linalg.eigvalsh(P)
    assert ev[0] > -1e-9 * max(ev[-1], 1.0), ev[0]
    assert np.isfinite(np.asarray(outs.Tsb)).all()


def test_init_corr_chunked_equals_full():
    """The while_loop cohort-chunked congruence (init_corr_chunk) is
    exact: e2e trajectory and final covariance/factor match the
    full-width single pass in both covariance forms, including a chunk
    width (3) that forces multi-chunk frames at the startup burst."""
    for form, chunks in (("full", (0, 8, 3)), ("sqrt", (0, 8))):
        res = {}
        for chunk in chunks:
            extra = {"propagation_mode": "fast"} if form == "sqrt" else {}
            cfg = config_from_json(PCW_CFG, dtype="float64",
                                   sim_initialize_depths=True,
                                   covariance_form=form,
                                   approximate_init_covariance=True,
                                   init_corr_chunk=chunk, **extra)
            s, o, gt = run_scan(cfg, total_time=6.0, noise_px=0.25)
            P = np.asarray(s.P)
            if form == "sqrt":
                P = P @ P.T
            res[chunk] = (P, np.asarray(o.Tsb))
        for chunk in chunks[1:]:
            np.testing.assert_allclose(
                res[chunk][1], res[0][1], atol=1e-7,
                err_msg=f"{form} chunk={chunk} trajectory")
            np.testing.assert_allclose(
                res[chunk][0], res[0][0], atol=1e-7,
                err_msg=f"{form} chunk={chunk} covariance")


def test_jac_blocks_fg_matches_per_pair():
    """The vectorized (F,G) jacobian sweep (init_cov._jac_blocks_fg)
    equals the per-pair obs_jacobian reference on random geometry."""
    import jax
    import jax.numpy as jnp
    from xivo_tpu import cam as cam_mod
    from xivo_tpu.filter.init_cov import _jac_blocks_fg, obs_jacobian
    from xivo_tpu.geom import so3

    rng = np.random.default_rng(7)
    F, G = 5, 4
    kind = cam_mod.MODEL_IDS["pinhole"]
    intrin = jnp.asarray([480.0, 640, 275, 275, 320, 240, 0, 0, 0, 0])
    Rbc = np.asarray(so3.exp(jnp.asarray([-1.55, 0.02, -0.01])))
    Tbc = jnp.asarray([0.02, -0.01, 0.03])
    Rsbr = jnp.asarray(np.stack([np.asarray(so3.exp(jnp.asarray(
        0.2 * rng.standard_normal(3)))) for _ in range(F)]))
    Tsbr = jnp.asarray(rng.standard_normal((F, 3)) * 0.5)
    Rg = jnp.asarray(np.stack([np.asarray(so3.exp(jnp.asarray(
        0.2 * rng.standard_normal(3)))) for _ in range(G)]))
    Tg = jnp.asarray(rng.standard_normal((G, 3)) * 0.5)
    x_s = jnp.asarray(np.concatenate(
        [0.2 * rng.standard_normal((F, 2)),
         np.log(rng.uniform(2.0, 6.0, (F, 1)))], axis=1))

    dtype = jnp.float64
    out_vec = _jac_blocks_fg(kind, intrin, jnp.asarray(Rbc), Tbc,
                             Rsbr, Tsbr, Rg, Tg, x_s, dtype)
    jac_g = jax.vmap(obs_jacobian, in_axes=(
        None, None, None, None, None, None, 0, 0, None, None))
    jac_fg = jax.vmap(jac_g, in_axes=(
        None, None, None, None, 0, 0, None, None, 0, None))
    out_ref = jac_fg(kind, intrin, jnp.asarray(Rbc), Tbc,
                     Rsbr, Tsbr, Rg, Tg, x_s, dtype)
    names = ["Hx", "Hc", "Hg", "Hr", "dint", "good"]
    for nm, a, b in zip(names, out_vec, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12, err_msg=nm)
