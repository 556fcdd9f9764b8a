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


def test_match_mode_tracks_through_large_motion():
    """MATCH tracker mode (Tracker::UpdateMatch, src/tracker.cpp:341-460):
    mutual-best descriptor matching keeps track identity across a jump
    far beyond the LK pyramid range, and unmatched detections spawn new
    tracks only up to num_features_max."""
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.state import init_state, TS_TRACKED, TS_DROPPED
    from xivo_tpu.frontend import init_frontend
    from xivo_tpu.frontend.tracker import tracker_only_frame
    from xivo_tpu.sim.render import render_dots
    from tests.test_image_vio import IMG_CFG, make_world
    from xivo_tpu.geom import so3

    cfg = config_from_json(IMG_CFG, dtype="float64",
                           tracker_type="MATCH")
    s = init_state(cfg)
    fes = init_frontend(cfg)
    Xs = make_world(300, seed=7)
    K = np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]])
    Rbc = np.asarray(so3.exp(jnp.asarray(cfg.X_Wbc)))
    Tbc = np.asarray(cfg.X_Tbc)
    R0 = np.eye(3)
    img0 = render_dots(Xs, R0 @ Rbc, np.zeros(3), K, 320, 240)

    s, fes = tracker_only_frame(cfg, s, fes, jnp.asarray(img0))
    fid0 = np.asarray(s.features.fid).copy()
    n0 = int((fid0 >= 0).sum())
    assert 10 < n0 <= cfg.num_features_max

    # large baseline: LK would fail, descriptor matching must not
    T1 = np.array([2.5, 0.0, 0.0])
    img1 = render_dots(Xs, R0 @ Rbc, R0 @ Tbc + T1, K, 320, 240)
    s, fes = tracker_only_frame(cfg, s, fes, jnp.asarray(img1))
    fr = s.features
    fid = np.asarray(fr.fid)
    track = np.asarray(fr.track)
    persisted = (fid >= 0) & np.isin(fid, fid0[fid0 >= 0]) \
        & (track == TS_TRACKED)
    assert persisted.sum() >= 10, persisted.sum()
    # live (non-dropped) count never exceeds the budget; dropped rows
    # recycle on the next frame
    live = np.asarray(fr.active) & (track != TS_DROPPED)
    assert int(live.sum()) <= cfg.num_features_max


def _rotated_image(img, center, theta):
    """I2(x) = I1(R^T (x - c) + c) sampled bilinearly."""
    from xivo_tpu.frontend.image import bilinear
    H, W = img.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    pts = jnp.stack([xs.ravel(), ys.ravel()], axis=1).astype(img.dtype)
    c, s = jnp.cos(-theta), jnp.sin(-theta)
    R = jnp.array([[c, -s], [s, c]], img.dtype)
    src = (pts - center) @ R.T + center
    return bilinear(img, src).reshape(H, W)


def test_orb_rotation_invariance():
    """Steered BRIEF survives a 35-degree in-plane rotation that breaks
    plain BRIEF (descriptor factory parity, src/tracker.cpp:36-97)."""
    from xivo_tpu.frontend import brief
    from xivo_tpu.frontend.descriptors import extract_orb, extract_freak
    from xivo_tpu.frontend.image import blur5

    rng = np.random.default_rng(3)
    img = blur5(blur5(jnp.asarray(rng.uniform(0, 255, (96, 96)))))
    c = jnp.asarray([48.0, 48.0])
    th = 35.0 * np.pi / 180
    img2 = _rotated_image(img, c, th)

    d_brief = int(brief.hamming(brief.extract(img, c),
                                brief.extract(img2, c)))
    d_orb = int(brief.hamming(extract_orb(img, c), extract_orb(img2, c)))
    d_freak = int(brief.hamming(extract_freak(img, c),
                                extract_freak(img2, c)))
    assert d_orb < 0.6 * d_brief, (d_orb, d_brief)
    assert d_freak < 0.6 * d_brief, (d_freak, d_brief)
    # self-distance sanity
    assert int(brief.hamming(extract_orb(img, c), extract_orb(img, c))) == 0


def test_descriptor_type_config_dispatch():
    from xivo_tpu.filter.config import config_from_json
    from tests.test_e2e_pcw import PCW_CFG
    cfg_json = dict(PCW_CFG)
    cfg_json["tracker_cfg"] = {**PCW_CFG["tracker_cfg"],
                               "descriptor": "ORB"}
    cfg = config_from_json(cfg_json)
    assert cfg.descriptor_type == "orb"
    from xivo_tpu.frontend.descriptors import KINDS
    assert cfg.descriptor_type in KINDS


def test_pointcloud_homography_rejection_drops_outliers():
    """do_outlier_rejection in POINTCLOUD mode: corrupted measurements
    inconsistent with the dominant inter-frame homography are dropped."""
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.pipeline import tracker_pointcloud
    from xivo_tpu.filter.state import TS_DROPPED, TS_TRACKED, init_state
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(dict(PCW_CFG), dtype="float64",
                           do_outlier_rejection=True)
    s = init_state(cfg)
    rng = np.random.default_rng(4)
    N = 60
    ids = np.arange(N, dtype=np.int32)
    xp0 = rng.uniform(60, 420, (N, 2))

    M = 256
    mid = np.full((M,), -1, np.int32)
    mxp = np.zeros((M, 2))
    mdep = np.full((M,), -1.0)
    mval = np.zeros((M,), bool)
    mid[:N] = ids
    mxp[:N] = xp0
    mval[:N] = True
    s = tracker_pointcloud(cfg, s, jnp.asarray(mid), jnp.asarray(mxp),
                           jnp.asarray(mdep), jnp.asarray(mval))

    # frame 2: uniform 3px shift (a translation homography), except 6
    # gross outliers displaced ~40 px in random directions
    mxp2 = mxp.copy()
    mxp2[:N] = xp0 + np.array([3.0, 1.5])
    bad = rng.choice(N, 6, replace=False)
    ang = rng.uniform(0, 2 * np.pi, 6)
    mxp2[bad] += 30.0 * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    s2 = tracker_pointcloud(cfg, s, jnp.asarray(mid), jnp.asarray(mxp2),
                            jnp.asarray(mdep), jnp.asarray(mval))
    fr = s2.features
    track = np.asarray(fr.track)
    fid = np.asarray(fr.fid)
    # outlier tracks are terminated (their unmatched measurements then
    # re-enter as NEW tracks, reference behavior) — no bad id survives
    # as TRACKED; the consistent majority does
    bad_rows = np.isin(fid, bad)
    good_rows = np.isin(fid, np.setdiff1d(ids, bad))
    assert (track[bad_rows] == TS_TRACKED).sum() == 0
    assert (track[bad_rows] == TS_DROPPED).sum() >= 5
    assert (track[good_rows] == TS_TRACKED).mean() > 0.9


def test_brisk_rotation_invariance_and_repeatability():
    """BRISK descriptor: rotation-invariant bits (long-pair orientation,
    Leutenegger et al. 2011); BRISK detector: corners persist across
    the rotation (detector factory parity, src/tracker.cpp:36-97)."""
    from xivo_tpu.frontend import brief
    from xivo_tpu.frontend.descriptors import extract_brisk
    from xivo_tpu.frontend.image import blur5

    rng = np.random.default_rng(4)
    img = blur5(blur5(jnp.asarray(rng.uniform(0, 255, (96, 96)))))
    c = jnp.asarray([48.0, 48.0])
    th = 35.0 * np.pi / 180
    img2 = _rotated_image(img, c, th)

    d_plain = int(brief.hamming(brief.extract(img, c),
                                brief.extract(img2, c)))
    d_brisk = int(brief.hamming(extract_brisk(img, c),
                                extract_brisk(img2, c)))
    assert d_brisk < 0.6 * max(d_plain, 1), (d_brisk, d_plain)
    assert int(brief.hamming(extract_brisk(img, c),
                             extract_brisk(img, c))) == 0


def test_new_detector_scores_fire_on_corners():
    """oFAST and BRISK detector responses peak at a checkerboard corner
    and stay zero on flat regions."""
    from xivo_tpu.frontend.fast import brisk_score, ofast_score

    # one bright square: its 4 corners are textbook FAST/AGAST corners
    # (an X-junction checkerboard center defeats the contiguous-arc
    # test by design)
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 200.0
    img += np.random.default_rng(0).normal(0, 1.0, img.shape)
    img = jnp.asarray(img)
    corners = np.array([[16, 16], [16, 47], [47, 16], [47, 47]])

    for fn in (ofast_score, brisk_score):
        sc = np.asarray(fn(img, 20.0))
        yx = np.unravel_index(sc.argmax(), sc.shape)
        d = np.abs(corners - np.asarray(yx)[None, :]).max(axis=1).min()
        assert d <= 3, (fn, yx)
        assert sc[28:36, 28:36].max() == 0.0  # flat interior silent


def test_brisk_descriptor_config_dispatch():
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.frontend.descriptors import KINDS
    from tests.test_e2e_pcw import PCW_CFG
    cfg_json = dict(PCW_CFG)
    cfg_json["tracker_cfg"] = {**PCW_CFG["tracker_cfg"],
                               "descriptor": "BRISK"}
    cfg = config_from_json(cfg_json)
    assert cfg.descriptor_type in KINDS
