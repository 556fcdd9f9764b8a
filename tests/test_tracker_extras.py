"""Homography outlier rejection + dropped-track rescue tests."""
import jax
import jax.numpy as jnp
import numpy as np

from xivo_tpu.frontend.homography import homography_ransac, _dlt_h, \
    _transfer_err


def test_dlt_homography_exact():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0],
                       [1e-4, -2e-4, 1.0]])
    p0 = rng.uniform(0, 100, (4, 2))
    q = np.concatenate([p0, np.ones((4, 1))], axis=1) @ H_true.T
    p1 = q[:, :2] / q[:, 2:3]
    H = np.asarray(_dlt_h(jnp.asarray(p0), jnp.asarray(p1)))
    err = np.asarray(_transfer_err(jnp.asarray(H), jnp.asarray(p0),
                                   jnp.asarray(p1)))
    assert err.max() < 1e-6


def test_homography_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    H_true = np.array([[1.05, 0.01, 3.0], [-0.02, 0.98, -2.0],
                       [5e-5, -1e-4, 1.0]])
    N = 60
    p0 = rng.uniform(0, 400, (N, 2))
    q = np.concatenate([p0, np.ones((N, 1))], axis=1) @ H_true.T
    p1 = q[:, :2] / q[:, 2:3] + rng.standard_normal((N, 2)) * 0.3
    # corrupt 10
    p1[:10] += rng.uniform(30, 80, (10, 2))
    inl, ok = homography_ransac(jax.random.PRNGKey(0), jnp.asarray(p0),
                                jnp.asarray(p1), jnp.ones(N, bool),
                                thresh=3.0)
    inl = np.asarray(inl)
    assert bool(ok)
    assert inl[10:].sum() >= 45
    assert inl[:10].sum() == 0


def test_dropped_track_rescue():
    """A track whose LK fails but whose descriptor reappears among new
    detections must be revived with the same fid."""
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.state import init_state, TS_TRACKED
    from xivo_tpu.frontend import init_frontend, tracker_image
    from xivo_tpu.sim.render import render_dots
    from tests.test_image_vio import IMG_CFG, make_world
    import jax.numpy as jnp

    cfg = config_from_json(IMG_CFG, dtype="float64",
                           match_dropped_tracks=True)
    s = init_state(cfg)
    fes = init_frontend(cfg)
    Xs = make_world(300, seed=4)
    K = np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]])
    from xivo_tpu.geom import so3
    Rbc = np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(cfg.X_Tbc)
    R0 = np.eye(3)
    T0 = np.zeros(3)
    img0 = render_dots(Xs, R0 @ Rbc, T0, K, 320, 240)

    s, fes = tracker_image(cfg, s, fes, jnp.asarray(img0))
    # second frame identical: tracks persist
    s, fes = tracker_image(cfg, s, fes, jnp.asarray(img0))
    fid0 = np.asarray(s.features.fid).copy()
    n0 = (fid0 >= 0).sum()
    assert n0 > 10

    # third frame: a LARGE jump (beyond the LK pyramid range) — LK fails,
    # but the same pattern shifted means descriptors match at the new
    # detections
    T1 = T0 + np.array([2.5, 0.0, 0.0])  # big baseline
    img1 = render_dots(Xs, R0 @ Rbc, R0 @ Tbc + T1, K, 320, 240)
    s, fes = tracker_image(cfg, s, fes, jnp.asarray(img1))
    fr = s.features
    revived = (np.asarray(fr.fid) >= 0) \
        & np.isin(np.asarray(fr.fid), fid0[fid0 >= 0]) \
        & (np.asarray(fr.track) == TS_TRACKED)
    # some of the old ids survive through rescue
    assert revived.sum() >= 3, revived.sum()
