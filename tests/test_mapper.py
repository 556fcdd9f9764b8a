"""Mapper / loop-closure tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.map import (init_map, map_insert, p3p_grunert, pnp_ransac)
from xivo_tpu.frontend import brief




def test_p3p_recovers_pose():
    RNG = np.random.default_rng(5)
    from scipy.spatial.transform import Rotation
    R_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    t_true = np.array([0.5, -1.0, 2.0])
    Xw = RNG.uniform(-3, 3, (3, 3)) + np.array([0, 0, 8.0])
    Xc = Xw @ R_true.T + t_true
    f = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    R4, t4, ok = p3p_grunert(jnp.asarray(Xw), jnp.asarray(f))
    errs = [float(jnp.linalg.norm(R4[i] - R_true)
                  + jnp.linalg.norm(t4[i] - t_true))
            for i in range(4) if bool(ok[i])]
    assert min(errs) < 1e-6


def test_pnp_ransac_with_outliers():
    RNG = np.random.default_rng(6)
    from scipy.spatial.transform import Rotation
    R_true = Rotation.from_rotvec([-0.1, 0.4, 0.2]).as_matrix()
    t_true = np.array([1.0, 0.3, -0.5])
    N = 40
    Xw = RNG.uniform(-4, 4, (N, 3)) + np.array([0, 0, 10.0])
    Xc = Xw @ R_true.T + t_true
    f = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    f[:8] = RNG.standard_normal((8, 3))
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    R, t, inl, ok = pnp_ransac(jax.random.PRNGKey(1), jnp.asarray(Xw),
                               jnp.asarray(f), jnp.ones(N, bool))
    assert bool(ok)
    inl = np.asarray(inl)
    assert inl[8:].sum() >= 28      # most true inliers kept
    assert inl[:8].sum() <= 1       # outliers rejected
    assert np.linalg.norm(np.asarray(R) - R_true) < 1e-6


def test_map_ring_buffer():
    RNG = np.random.default_rng(7)
    ms = init_map(capacity=16)
    Xs = jnp.asarray(RNG.standard_normal((10, 3)), jnp.float32)
    desc = jnp.asarray(RNG.integers(0, 2**32, (10, 8), dtype=np.uint32))
    ms = map_insert(ms, Xs, desc, jnp.ones(10, bool))
    assert int(ms.valid.sum()) == 10
    assert int(ms.write_ptr) == 10
    # wrap-around
    ms = map_insert(ms, Xs, desc, jnp.ones(10, bool))
    assert int(ms.valid.sum()) == 16
    assert int(ms.write_ptr) == 4
    assert int(ms.count) == 20


def _drift_scenario():
    """Map at the true poses + a filter that believes it drifted."""
    RNG = np.random.default_rng(8)
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.filter import layout as L
    from xivo_tpu.map.mapper import close_loop
    from xivo_tpu import cam as cam_mod
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(PCW_CFG, dtype="float64")
    s = init_state(cfg)
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    # landmarks in front of the camera at the TRUE pose (identity body)
    N = 20
    Xs_true = np.stack([RNG.uniform(-3, 3, N), RNG.uniform(6, 12, N),
                        RNG.uniform(-2, 2, N)], axis=1)
    descs = jnp.asarray(RNG.integers(0, 2**32, (N, 8), dtype=np.uint32))
    ms = init_map(512, dtype=jnp.float64)
    from xivo_tpu.map.mapper import map_insert
    ms = map_insert(ms, jnp.asarray(Xs_true), descs, jnp.ones(N, bool))

    # pixels observed from the TRUE pose
    Rbc = np.asarray(s.X.Rbc)
    Tbc = np.asarray(s.X.Tbc)
    Xc = (Xs_true - Tbc) @ Rbc      # body = identity at truth
    xp = []
    for i in range(N):
        xcn = Xc[i, :2] / Xc[i, 2]
        xp.append(np.asarray(cam_mod.project(kind, s.cam,
                                             jnp.asarray(xcn))))
    xp = np.asarray(xp)

    # the filter believes it drifted: Tsb offset + some pose uncertainty
    drift = np.array([0.3, -0.2, 0.15])
    X = s.X._replace(Tsb=jnp.asarray(drift))
    P = s.P.at[L.TSB:L.TSB + 3, L.TSB:L.TSB + 3].set(
        jnp.eye(3, dtype=jnp.float64) * 0.25)
    s = s._replace(X=X, P=P)

    # install the observations as instate features with matching
    # descriptors (slot i <-> map i)
    fr = s.features
    F = cfg.dims.n_features
    n_use = min(N, F)
    fr = fr._replace(
        fid=fr.fid.at[:n_use].set(jnp.arange(n_use, dtype=jnp.int32)),
        status=fr.status.at[:n_use].set(4),
        sind=fr.sind.at[:n_use].set(jnp.arange(n_use, dtype=jnp.int32)),
        ref=fr.ref.at[:n_use].set(0),
        xp=fr.xp.at[:n_use].set(jnp.asarray(xp[:n_use])),
        desc=fr.desc.at[:n_use].set(descs[:n_use]))
    f2row = s.f2row.at[:n_use].set(jnp.arange(n_use, dtype=jnp.int32))
    s = s._replace(features=fr, f2row=f2row)
    return cfg, s, ms, drift


def test_close_loop_corrects_drifted_pose():
    from xivo_tpu.map.mapper import close_loop
    cfg, s, ms, drift = _drift_scenario()
    s2, n_lc = close_loop(cfg, s, ms)
    assert int(n_lc) >= 5
    resid = np.linalg.norm(np.asarray(s2.X.Tsb) - np.zeros(3))
    assert resid < 0.1 * np.linalg.norm(drift), (np.asarray(s2.X.Tsb))


@pytest.mark.slow
def test_close_loop_with_sharded_retrieval_matches():
    """Map-scale path: the same LC step with the descriptor table
    sharded over the 8-device mesh (dist/retrieval) gives the same
    correction as the single-chip einsum."""
    from jax.sharding import Mesh
    from xivo_tpu.dist.retrieval import make_sharded_matcher
    from xivo_tpu.map.mapper import close_loop

    cfg, s, ms, drift = _drift_scenario()
    s1, n1 = close_loop(cfg, s, ms)

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    matcher = make_sharded_matcher(mesh)
    s8, n8 = close_loop(cfg, s, ms, matcher=matcher)
    assert int(n8) == int(n1)
    np.testing.assert_allclose(np.asarray(s8.X.Tsb), np.asarray(s1.X.Tsb),
                               atol=1e-9)


def test_map_fusion_on_reretire():
    """Merge-on-retirement parity (Feature::Merge, src/feature.cpp:
    187-208): a landmark retired twice FUSES — the map count stays
    flat and its variance shrinks — instead of duplicating in the
    ring (src/mapper.cpp:158-222)."""
    rng = np.random.default_rng(3)
    ms = init_map(capacity=64)
    Xs = jnp.asarray(rng.uniform(-2, 2, (6, 3)), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (6, 8)), jnp.uint32)
    cov = jnp.tile(0.2 * jnp.eye(3, dtype=jnp.float32), (6, 1, 1))
    ms = map_insert(ms, Xs, desc, jnp.ones(6, bool), cov=cov,
                    nn_dist_thresh=30)
    assert int(ms.count) == 6

    # re-retire the same landmarks, slightly moved, same descriptors
    Xs2 = Xs + jnp.asarray(rng.normal(0, 0.05, (6, 3)), jnp.float32)
    ms2 = map_insert(ms, Xs2, desc, jnp.ones(6, bool), cov=cov,
                     nn_dist_thresh=30)
    assert int(ms2.count) == 6              # count stays flat
    assert int(ms2.n_merged) == 6
    assert int(ms2.valid.sum()) == 6
    # covariance-weighted fusion halves the variance (equal weights)
    tr0 = float(jnp.trace(ms.cov[0]))
    tr1 = float(jnp.trace(ms2.cov[0]))
    assert tr1 < 0.6 * tr0, (tr0, tr1)
    # fused position lands between the two observations
    mid = 0.5 * (Xs[0] + Xs2[0])
    assert float(jnp.linalg.norm(ms2.Xs[0] - mid)) < 1e-5

    # a genuinely NEW landmark (different descriptor) still ring-inserts
    nd = jnp.asarray(rng.integers(0, 2 ** 32, (1, 8)), jnp.uint32)
    ms3 = map_insert(ms2, Xs[:1] + 5.0, nd, jnp.ones(1, bool),
                     cov=cov[:1], nn_dist_thresh=30)
    assert int(ms3.count) == 7


def test_map_fusion_respects_radius():
    """Same descriptor but a FAR position must not fuse (distinct
    landmark with an aliasing descriptor)."""
    rng = np.random.default_rng(4)
    ms = init_map(capacity=32)
    Xs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (1, 8)), jnp.uint32)
    cov = jnp.tile(0.1 * jnp.eye(3, dtype=jnp.float32), (1, 1, 1))
    ms = map_insert(ms, Xs, desc, jnp.ones(1, bool), cov=cov,
                    nn_dist_thresh=30)
    ms2 = map_insert(ms, Xs + 10.0, desc, jnp.ones(1, bool), cov=cov,
                     nn_dist_thresh=30, merge_radius=0.5)
    assert int(ms2.count) == 2
    assert int(ms2.n_merged) == 0
