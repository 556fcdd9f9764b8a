"""Map-scale mapping: observation retention + BA-over-the-map refinement.

Capability gap in the reference: its Optimizer builds g2o vertices on
retirement but Solve is never triggered (src/optimizer.h:2-3 dead
comment). Here refine_map is a real job, single-device and
landmark-sharded (dist/ba.py) — tested for noise reduction and N=1 vs
N=8 equivalence on the emulated mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.geom import so3
from xivo_tpu.map.bigmap import (BigMapState, init_bigmap, map_ba_problem,
                                 refine_map, retire_features_obs,
                                 as_mapstate)
from tests.test_e2e_pcw import PCW_CFG


def synthetic_bigmap(cfg, n_lm=64, n_kf=10, noise=0.05, seed=0):
    """Perfect world: random landmarks observed from a keyframe arc, then
    landmark positions + non-fixed keyframes corrupted with noise."""
    rng = np.random.default_rng(seed)
    bm = init_bigmap(cfg, capacity=128, obs_cap=8, kf_capacity=16,
                     dtype=jnp.float64)
    Xs_true = rng.uniform([-2, -2, 4], [2, 2, 8], (n_lm, 3))
    kf_R, kf_T = [], []
    for k in range(n_kf):
        w = rng.normal(0, 0.05, 3)
        kf_R.append(np.asarray(so3.exp(jnp.asarray(w))))
        kf_T.append(np.array([0.4 * k - 2.0, 0.1 * rng.normal(), 0.0]))
    kf_R, kf_T = np.stack(kf_R), np.stack(kf_T)

    O = 8
    obs_kf = np.full((128, O), -1, np.int32)
    obs_xn = np.zeros((128, O, 2))
    for li in range(n_lm):
        ks = rng.choice(n_kf, size=min(O, 4), replace=False)
        for oi, k in enumerate(ks):
            Xc = kf_R[k].T @ (Xs_true[li] - kf_T[k])
            obs_kf[li, oi] = k
            obs_xn[li, oi] = Xc[:2] / Xc[2]
    valid = np.zeros(128, bool)
    valid[:n_lm] = True
    kf_valid = np.zeros(16, bool)
    kf_valid[:n_kf] = True

    Xs_noisy = Xs_true + rng.normal(0, noise, (n_lm, 3))
    kf_T_noisy = kf_T.copy()
    kf_T_noisy[2:] += rng.normal(0, noise, (n_kf - 2, 3))

    Xs = np.zeros((128, 3))
    Xs[:n_lm] = Xs_noisy
    bm = bm._replace(
        Xs=jnp.asarray(Xs), valid=jnp.asarray(valid),
        obs_kf=jnp.asarray(obs_kf), obs_xn=jnp.asarray(obs_xn),
        kf_R=bm.kf_R.at[:n_kf].set(jnp.asarray(kf_R)),
        kf_T=bm.kf_T.at[:n_kf].set(jnp.asarray(kf_T_noisy)),
        kf_valid=jnp.asarray(kf_valid))
    return bm, Xs_true, kf_T


@pytest.fixture(scope="module")
def cfg64():
    return config_from_json(PCW_CFG, dtype="float64",
                            sim_initialize_depths=True)


def test_refine_map_reduces_error(cfg64):
    bm, Xs_true, kf_T_true = synthetic_bigmap(cfg64)
    err0 = np.linalg.norm(np.asarray(bm.Xs[:64]) - Xs_true, axis=1).mean()
    bm2, chi2 = refine_map(cfg64, bm, iters=12, damping=1e-6)
    err1 = np.linalg.norm(np.asarray(bm2.Xs[:64]) - Xs_true, axis=1).mean()
    assert float(chi2[-1]) < 0.01 * float(chi2[0]), np.asarray(chi2)
    assert err1 < 0.2 * err0, (err0, err1)
    # keyframes recovered too
    kerr = np.linalg.norm(np.asarray(bm2.kf_T[:10]) - kf_T_true, axis=1)
    assert kerr.max() < 0.01, kerr


def test_refine_map_sharded_matches_single(cfg64):
    from jax.sharding import Mesh
    bm, Xs_true, _ = synthetic_bigmap(cfg64)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    bm1, chi1 = refine_map(cfg64, bm, iters=8, damping=1e-6)
    bm8, chi8 = refine_map(cfg64, bm, iters=8, damping=1e-6, mesh=mesh)
    # chi2 histories agree up to fp reduction order (psum vs local sum);
    # at convergence chi2 ~ 1e-20 where that order noise is ~1e-6
    # relative — add an absolute floor so the equivalence contract is
    # tested where it means something
    np.testing.assert_allclose(np.asarray(chi8), np.asarray(chi1),
                               rtol=3e-5, atol=1e-18)
    np.testing.assert_allclose(np.asarray(bm8.Xs), np.asarray(bm1.Xs),
                               atol=1e-8)


def test_retirement_records_observations(cfg64):
    """Drive the real filter for a few seconds; retire dropped instate
    features into the BigMap and check the observation rows reproject."""
    from xivo_tpu.filter.pipeline import vio_frame
    from xivo_tpu.filter.state import TS_DROPPED, init_state
    from xivo_tpu.runner import FrameInputs
    from xivo_tpu.sim.stream import build_pcw_stream

    cfg = cfg64
    fi, gt = build_pcw_stream(cfg, total_time=6.0, noise_px=0.25)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    bm = init_bigmap(cfg, capacity=512, obs_cap=8, kf_capacity=64,
                     dtype=jnp.float64)

    @jax.jit
    def step(s, bm, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        from xivo_tpu.filter.pipeline import (tracker_pointcloud,
                                              _propagate_frame_fast)
        # mirror map/integration.py ordering: retire after tracking,
        # before the update clears dropped rows
        s2 = _propagate_frame_fast(cfg, s, gy, ac, idt, fdt)
        s2 = tracker_pointcloud(cfg, s2, mid, mxp, mdep, mval)
        fr = s2.features
        retire = fr.active & (fr.track == TS_DROPPED) & (fr.sind >= 0)
        bm = retire_features_obs(cfg, s2, bm, retire)
        from xivo_tpu.filter.pipeline import update_step
        s2, out = update_step(cfg, s2)
        return s2, bm, out

    T = fi.frame_dt.shape[0]
    for k in range(T):
        inp = jax.tree.map(lambda x: jnp.asarray(x[k]), tuple(fi))
        s, bm, out = step(s, bm, inp)

    n = int(bm.count)
    assert n > 10, n
    # every retired landmark has >= 1 recorded observation, and the
    # observations reproject onto the stored landmark within tolerance
    v = np.asarray(bm.valid)
    obs_kf = np.asarray(bm.obs_kf)[v]
    assert (obs_kf >= 0).any(axis=1).mean() > 0.9
    Xs = np.asarray(bm.Xs)[v]
    kf_R = np.asarray(bm.kf_R)
    kf_T = np.asarray(bm.kf_T)
    xn = np.asarray(bm.obs_xn)[v]
    errs = []
    for li in range(Xs.shape[0]):
        for oi in range(obs_kf.shape[1]):
            k = obs_kf[li, oi]
            if k < 0:
                continue
            Xc = kf_R[k].T @ (Xs[li] - kf_T[k])
            if Xc[2] < 0.1:
                continue
            errs.append(np.linalg.norm(Xc[:2] / Xc[2] - xn[li, oi]))
    assert np.median(errs) < 0.02, np.median(errs)

    # and the retained map refines without blowing up
    bm2, chi2 = refine_map(cfg, bm, iters=5, damping=1e-4,
                           huber_thresh=0.05)
    assert float(chi2[-1]) <= float(chi2[0]) * 1.01
    assert np.isfinite(np.asarray(bm2.Xs)).all()
