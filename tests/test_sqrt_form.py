"""Square-root (Cholesky-factor) covariance filter tests.

Unit checks of the factor algebra against the dense Joseph-form
reference, plus full-vs-sqrt end-to-end equivalence on the PCW
simulation (the two representations implement the same filter, so x64
trajectories must agree tightly), and a float32 robustness check — the
design goal named by SURVEY.md §7.3.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter import layout as L
from xivo_tpu.filter.config import VIOConfig, config_from_json
from xivo_tpu.filter.sqrt_form import (chol3x3, cov_full, factor_cols,
                                       factor_from_cov, factor_propagate,
                                       factor_recompress, factor_zero_rows,
                                       noise_factor, noise_rows, slack_cols,
                                       sqrt_update)
from xivo_tpu.filter.state import init_state
from xivo_tpu.filter.update import joseph_update, mh_distances
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream

from test_e2e_pcw import PCW_CFG


def _rand_factor(key, D, C, zero_rows=()):
    A = jax.random.normal(key, (D, D), jnp.float64) * 0.3
    S = jnp.linalg.cholesky(A @ A.T + 0.1 * jnp.eye(D))
    for r in zero_rows:
        S = S.at[r, :].set(0.0)
        S = S.at[:, r].set(0.0)
    return jnp.pad(S, ((0, 0), (0, C)))


def test_sqrt_update_matches_joseph():
    D, C, F = 40, 12, 6
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    S = _rand_factor(k1, D, C, zero_rows=(7, 23))
    P = cov_full(S)
    H = jax.random.normal(k2, (2 * F, D), jnp.float64)
    H = H.at[:, 7].set(0.0).at[:, 23].set(0.0)
    inn = jax.random.normal(k3, (2 * F,), jnp.float64)
    diagR = jnp.full((2 * F,), 1.3, jnp.float64)
    valid = jnp.array([True, True, False, True, False, True])

    err_j, P_j = joseph_update(P, H, inn, diagR, valid)
    err_s, S_s = sqrt_update(S, H, inn, diagR, jnp.repeat(valid, 2))

    np.testing.assert_allclose(np.asarray(err_s), np.asarray(err_j),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(cov_full(S_s)), np.asarray(P_j),
                               rtol=1e-8, atol=1e-10)
    # zeroed rows stay exactly zero in the factor
    assert np.abs(np.asarray(S_s[7])).max() == 0.0
    assert np.abs(np.asarray(S_s[23])).max() == 0.0


def test_sqrt_update_odd_rows_per_row_validity():
    """OOS-style call: odd row count, per-row (not per-feature) masks."""
    D, C = 30, 8
    key = jax.random.PRNGKey(5)
    S = _rand_factor(key, D, C)
    P = cov_full(S)
    H = jax.random.normal(jax.random.PRNGKey(6), (7, D), jnp.float64)
    inn = jax.random.normal(jax.random.PRNGKey(7), (7,), jnp.float64)
    diagR = jnp.full((7,), 2.0, jnp.float64)
    rv = jnp.array([True, False, True, True, True, False, True])

    Hm = H * rv[:, None]
    innm = inn * rv
    Rm = jnp.where(rv, diagR, 1.0)
    HP = Hm @ P
    Sm = HP @ Hm.T + jnp.diag(Rm)
    K = jnp.linalg.solve(Sm, HP).T
    err_ref = K @ innm
    P_ref = P - K @ HP

    err_s, S_s = sqrt_update(S, H, inn, diagR, rv)
    np.testing.assert_allclose(np.asarray(err_s), np.asarray(err_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(cov_full(S_s)), np.asarray(P_ref),
                               rtol=1e-8, atol=1e-10)


def test_factor_recompress_preserves_P():
    D, C = 25, 10
    S = _rand_factor(jax.random.PRNGKey(1), D, C, zero_rows=(4,))
    # dirty the slack workspace
    S = S.at[:, D:].set(jax.random.normal(jax.random.PRNGKey(2), (D, C),
                                          jnp.float64) * 0.05)
    S = S.at[4, :].set(0.0)
    P0 = cov_full(S)
    Sr = factor_recompress(S, D)
    assert Sr.shape == S.shape
    np.testing.assert_allclose(np.asarray(cov_full(Sr)), np.asarray(P0),
                               rtol=1e-9, atol=1e-12)
    # slack re-zeroed, zero rows stay zero
    assert np.abs(np.asarray(Sr[:, D:])).max() == 0.0
    assert np.abs(np.asarray(Sr[4])).max() == 0.0


def test_noise_factor_frozen_rows():
    cfg = VIOConfig(propagation_mode="fast", covariance_form="sqrt")
    rows = np.asarray(noise_rows(cfg))
    k = len(rows)
    A = np.random.RandomState(0).randn(k, k) * 1e-3
    Qsub = A @ A.T
    Qd = np.zeros((L.MOTION, L.MOTION))
    Qd[np.ix_(rows, rows)] = Qsub
    Lq = np.asarray(noise_factor(cfg, jnp.asarray(Qd)))
    np.testing.assert_allclose(Lq @ Lq.T, Qd, rtol=1e-5, atol=1e-12)
    frozen = sorted(set(range(L.MOTION)) - set(rows.tolist()))
    assert np.abs(Lq[frozen, :]).max() == 0.0
    assert np.abs(Lq[:, frozen]).max() == 0.0


def test_factor_from_cov_roundtrip():
    D = 20
    S = _rand_factor(jax.random.PRNGKey(9), D, 1, zero_rows=(3, 11))
    P = S @ S.T

    class Dims:
        full = D
        n_features = 2
    S2 = factor_from_cov(P, Dims)
    np.testing.assert_allclose(np.asarray(cov_full(S2)), np.asarray(P),
                               rtol=1e-9, atol=1e-12)
    assert np.abs(np.asarray(S2[3])).max() == 0.0


def test_mh_distances_factor_matches_dense():
    D, C, F = 35, 9, 5
    S = _rand_factor(jax.random.PRNGKey(11), D, C)
    P = cov_full(S)
    H = jax.random.normal(jax.random.PRNGKey(12), (2 * F, D), jnp.float64)
    inn = jax.random.normal(jax.random.PRNGKey(13), (2 * F,), jnp.float64)
    d_dense = mh_distances(P, H, inn, 1.7)
    d_factor = mh_distances(S, H, inn, 1.7)
    np.testing.assert_allclose(np.asarray(d_factor), np.asarray(d_dense),
                               rtol=1e-9)


def _run(cfg, total_time=4.0):
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25)
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    return s, outs, gt


def test_e2e_full_vs_sqrt_equivalence():
    """Same filter, two covariance representations: x64 trajectories and
    reconstructed covariances must agree tightly frame by frame."""
    base = config_from_json(PCW_CFG, dtype="float64",
                            sim_initialize_depths=True,
                            propagation_mode="fast")
    cfg_f = base
    cfg_s = dataclasses.replace(base, covariance_form="sqrt")

    sf, of, gt = _run(cfg_f)
    ss, os_, _ = _run(cfg_s)

    np.testing.assert_allclose(np.asarray(os_.Tsb), np.asarray(of.Tsb),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(os_.Vsb), np.asarray(of.Vsb),
                               rtol=0, atol=1e-5)
    # same structural decisions throughout
    np.testing.assert_array_equal(np.asarray(os_.num_instate_features),
                                  np.asarray(of.num_instate_features))
    np.testing.assert_array_equal(np.asarray(os_.num_mh_rejected),
                                  np.asarray(of.num_mh_rejected))
    # final covariance agrees after reconstruction
    Pf = np.asarray(sf.P)
    Ps = np.asarray(cov_full(ss.P))
    np.testing.assert_allclose(Ps, Pf, rtol=0, atol=2e-6)


def test_e2e_sqrt_float32_tracks():
    """The design goal: float32 sqrt-form runs healthily with NO global
    matmul-precision flag (library-scoped precision + structural PSD)."""
    cfg = config_from_json(PCW_CFG, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast",
                           covariance_form="sqrt")
    s, outs, gt = _run(cfg, total_time=5.0)
    assert np.isfinite(np.asarray(s.P)).all()
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.10, rmse
    # factor invariant: slack workspace zero between frames, freed slots
    # carry exactly-zero rows
    D = cfg.dims.full
    S = np.asarray(s.P)
    assert S.shape == (D, factor_cols(cfg.dims))
    assert np.abs(S[:, D:]).max() == 0.0
    from xivo_tpu.filter.validate import validate_state
    assert validate_state(cfg, s) == []


@pytest.mark.slow
def test_e2e_sqrt_with_options():
    """sqrt form composes with OOS, FEJ, init-cov correlations, 1pt
    RANSAC and Huber (exercises every factor-path branch)."""
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True,
                           propagation_mode="fast",
                           covariance_form="sqrt",
                           use_OOS=True, use_fej=True,
                           approximate_init_covariance=True,
                           use_1pt_RANSAC=True, use_huber=True)
    s, outs, gt = _run(cfg, total_time=4.0)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert np.isfinite(rmse) and rmse < 0.15, rmse


def test_sqrt_update_wide_stack_chunked_matches_joint():
    """Stacks past the fused-kernel wall (m > 128) run as sequential
    block downdates (sqrt_form.sqrt_update); with diagonal R that is
    algebraically EXACT — pin equality with the joint dense update at
    the OOS stack width (m ~ 216, cf. oos.py)."""
    D, C, m = 50, 10, 216
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    S = _rand_factor(k1, D, C, zero_rows=(5,))
    P = cov_full(S)
    H = jax.random.normal(k2, (m, D), jnp.float64) * 0.5
    H = H.at[:, 5].set(0.0)
    inn = jax.random.normal(k3, (m,), jnp.float64)
    diagR = jnp.full((m,), 1.7, jnp.float64)
    rv = jax.random.bernoulli(k4, 0.8, (m,))

    Hm = H * rv[:, None]
    innm = inn * rv
    Rm = jnp.where(rv, diagR, 1.0)
    HP = Hm @ P
    Sm = HP @ Hm.T + jnp.diag(Rm)
    K = jnp.linalg.solve(Sm, HP).T
    err_ref = K @ innm
    P_ref = P - K @ HP

    err_s, S_s = sqrt_update(S, H, inn, diagR, rv)
    np.testing.assert_allclose(np.asarray(err_s), np.asarray(err_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cov_full(S_s)), np.asarray(P_ref),
                               rtol=1e-7, atol=1e-9)
    assert np.abs(np.asarray(S_s[5])).max() == 0.0
