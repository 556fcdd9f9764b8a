"""MSCKF/OOS update tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from tests.test_e2e_pcw import PCW_CFG, run_scan


def test_nullspace_projection_property():
    """The projected OOS rows must be orthogonal to the landmark Jacobian."""
    import jax
    Hf = jnp.asarray(np.random.default_rng(0).standard_normal((30, 3)))
    # zero some rows (masked observations)
    Hf = Hf.at[10:].set(0.0)
    Q, _ = jnp.linalg.qr(Hf, mode="complete")
    A = Q[:, 3:]
    assert np.allclose(np.asarray(A.T @ Hf), 0.0, atol=1e-10)
    # A spans 2G-3 dims
    assert A.shape == (30, 27)


def test_oos_update_runs_and_tracks():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True, use_OOS=True,
                           OOS_min_observations=5)
    s, outs, gt = run_scan(cfg, total_time=6.0, noise_px=0.25)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = np.sqrt(np.mean(err ** 2))
    assert np.isfinite(np.asarray(s.P)).all()
    assert rmse < 0.12, rmse


def _churn_scenario(**overrides):
    """Narrow-FoV camera + rotation-rich motion + tiny EKF window:
    tracks sweep out of view fast, most die before admission, carrying
    multi-view geometry only the MSCKF update can harvest."""
    from xivo_tpu.filter.layout import Dims
    from xivo_tpu.filter.state import init_state
    from xivo_tpu.runner import make_sequence_runner
    from xivo_tpu.sim.stream import build_pcw_stream

    dims = Dims(n_groups=8, n_features=6, ng_rows=64, nf_rows=128)
    base = dict(PCW_CFG)
    base["camera_cfg"] = {"model": "pinhole", "rows": 200, "cols": 200,
                          "fx": 275, "fy": 275, "cx": 100, "cy": 100}
    base["tracker_cfg"] = dict(PCW_CFG["tracker_cfg"],
                               num_features_max=48)
    cfg = config_from_json(base, dtype="float64", dims=dims,
                           sim_initialize_depths=True,
                           OOS_min_observations=3,
                           max_group_lifetime=200, **overrides)
    fi, gt = build_pcw_stream(cfg, total_time=6.0, noise_px=0.5, seed=5,
                              motion="calib_rich", n_points=900)
    s = init_state(cfg)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                   last_accel=jnp.asarray(gt["accel0"]))
    s, outs = make_sequence_runner(cfg)(s, fi)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    return float(np.sqrt((err ** 2).mean())), outs


@pytest.mark.slow
def test_oos_ab_improves_ate_under_churn():
    """A/B: under heavy feature churn the MSCKF harvest (use_OOS +
    pose cloning) measurably improves ATE over discarding the dying
    tracks' information. This is the quantified benefit the reference
    never ships (use_OOS hard-faults, src/estimator.cpp:120-122).
    Measured here: ~9x (1.11 m -> 0.12 m over 6 s)."""
    rmse_off, _ = _churn_scenario(use_OOS=False)
    rmse_on, outs_on = _churn_scenario(use_OOS=True)
    assert np.isfinite(rmse_on)
    assert rmse_on < 0.5 * rmse_off, (rmse_on, rmse_off)
    # the default cap is adequate in this regime — no silent truncation
    assert int(np.asarray(outs_on.num_oos_dropped).sum()) == 0


@pytest.mark.slow
def test_oos_cap_overflow_is_reported():
    """The static oos_feature_cap must not truncate silently: candidates
    beyond the cap surface in StepOutputs.num_oos_dropped."""
    _, outs = _churn_scenario(use_OOS=True, oos_feature_cap=1)
    assert int(np.asarray(outs.num_oos_dropped).max()) > 0


def test_oos_rows_vectorized_matches_per_feature():
    """The fused (CAP, G) OOS row builder (_oos_rows_all) equals the
    per-feature G-unrolled builder on a real mid-run state, including
    FEJ linearization and invalid (-1) rows."""
    import jax
    from xivo_tpu.filter.oos import _oos_rows_all, _oos_rows_for_feature

    for fej in (False, True):
        cfg = config_from_json(PCW_CFG, dtype="float64",
                               sim_initialize_depths=True, use_OOS=True,
                               clone_frame_groups=True, use_fej=fej)
        s, outs, gt = run_scan(cfg, total_time=4.0, noise_px=0.25)
        adj = np.asarray(s.features.adj)
        cand = np.where(adj.sum(axis=1) >= 2)[0][:6]
        rows = np.full(8, -1, np.int32)
        rows[:len(cand)] = cand
        rows = jnp.asarray(rows)
        Ho_v, inn_v, val_v = _oos_rows_all(cfg, s, rows)
        Ho_r, inn_r, val_r = jax.vmap(
            lambda r: _oos_rows_for_feature(cfg, s, r))(rows)
        np.testing.assert_array_equal(np.asarray(val_v), np.asarray(val_r))
        np.testing.assert_allclose(np.asarray(Ho_v), np.asarray(Ho_r),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(inn_v), np.asarray(inn_r),
                                   atol=1e-10)


def test_oos_compression_is_equivalent():
    """Measurement compression is exactly equivalent for iid R (the
    update depends on H only through H^T H / H^T inn). The default
    compression_trigger_ratio (1.5, reference src/estimator.cpp:116-117)
    leaves the ~1.05x-D OOS stack uncompressed, so this pin FORCES the
    trigger (ratio 0.5) and checks the trajectory matches."""
    res = {}
    for ratio in (0.5, 10.0):
        cfg = config_from_json(PCW_CFG, dtype="float64",
                               sim_initialize_depths=True, use_OOS=True,
                               clone_frame_groups=True,
                               compression_trigger_ratio=ratio)
        s, outs, gt = run_scan(cfg, total_time=4.0, noise_px=0.25)
        res[ratio] = np.asarray(outs.Tsb)
    np.testing.assert_allclose(res[0.5], res[10.0], atol=1e-6)


def test_householder_nullspace_matches_qr():
    """The 3-reflector sweep must (a) annihilate Hf, (b) carry the same
    information as the complete-QR projection: row spans of the
    projected [Hx|inn] agree (equal up to a left orthogonal mix)."""
    from xivo_tpu.filter.oos import _householder_nullspace
    rng = np.random.default_rng(3)
    m, D = 16, 20
    Hf = jnp.asarray(rng.standard_normal((m, 3)))
    Hf = Hf.at[9:].set(0.0)  # masked observations
    Hx = jnp.asarray(rng.standard_normal((m, D)))
    inn = jnp.asarray(rng.standard_normal((m,)))
    Ho, inn_o = _householder_nullspace(Hf, Hx, inn)
    assert Ho.shape == (m - 3, D)
    # (a) orthogonal to the landmark Jacobian: rows of Q^T Hf below 3
    # are zero, so Ho rows carry no Hf component; verify via the
    # information identity instead of reconstructing Q:
    Q, _ = jnp.linalg.qr(Hf, mode="complete")
    A = Q[:, 3:]
    Ho_qr = A.T @ Hx
    inn_qr = A.T @ inn
    M1 = np.concatenate([np.asarray(Ho), np.asarray(inn_o)[:, None]], 1)
    M2 = np.concatenate([np.asarray(Ho_qr), np.asarray(inn_qr)[:, None]], 1)
    # (b) same Gram = same EKF update under iid R
    np.testing.assert_allclose(M1.T @ M1, M2.T @ M2, atol=1e-9)
    # direct annihilation check: projecting Hf itself gives zero rows
    Hf_proj, _ = _householder_nullspace(Hf, Hf, inn * 0)
    np.testing.assert_allclose(np.asarray(Hf_proj), 0.0, atol=1e-10)
