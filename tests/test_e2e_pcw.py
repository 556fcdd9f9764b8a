"""End-to-end filter tests on the point-cloud-world simulation.

The port of the reference's tier-3 regression strategy (SURVEY.md §4):
deterministic synthetic world + trajectory with exact ground truth,
driving every filter path. Also checks scan-mode == streaming-mode
consistency and float32 sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
# canonical world config lives in the package (bench.py shares it);
# re-exported here because many test modules import it from this one
from xivo_tpu.sim.configs import PCW_CFG  # noqa: F401


def run_scan(cfg, total_time=6.0, **kw):
    fi, gt = build_pcw_stream(cfg, total_time=total_time, **kw)
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))
    run = make_sequence_runner(cfg)
    s, outs = run(s, fi)
    return s, outs, gt


@pytest.fixture(scope="module")
def scan_result():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    return run_scan(cfg, total_time=6.0, noise_px=0.25)


def test_pcw_tracks_ground_truth(scan_result):
    s, outs, gt = scan_result
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    rmse = np.sqrt(np.mean(err ** 2))
    assert rmse < 0.10, rmse
    assert err[-1] < 0.15, err[-1]
    # velocity locked too
    verr = np.linalg.norm(np.asarray(outs.Vsb) - gt["Vsb"], axis=1)
    assert verr[-1] < 0.1


def test_pcw_filter_health(scan_result):
    s, outs, gt = scan_result
    # filter populates its window and keeps tracking
    assert int(outs.num_instate_features[-1]) > 10
    assert int(outs.num_tracked[20:].min()) > 30
    # innovations bounded (pixels)
    assert float(np.nanmax(np.asarray(outs.inn_rms)[5:])) < 10.0
    # covariance stays finite and symmetric
    P = np.asarray(s.P)
    assert np.isfinite(P).all()
    assert np.allclose(P, P.T, atol=1e-8)


def test_huber_and_angular_triangulation_options():
    """use_huber (HuberOnInnovation parity) and the l2/linf angular
    triangulation methods run end-to-end and still track ground truth."""
    cfg = config_from_json(
        dict(PCW_CFG, use_huber=True, triangulate_pre_subfilter=True,
             triangulation={"method": "l2_angular"}),
        dtype="float64", sim_initialize_depths=True)
    _, outs, gt = run_scan(cfg, total_time=4.0, noise_px=0.25)
    err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
    assert np.sqrt(np.mean(err ** 2)) < 0.12


def test_scan_matches_streaming():
    """lax.scan over packed inputs == the streaming API, frame by frame."""
    from xivo_tpu.api import Estimator
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=2.0, noise_px=0.0)
    s, outs, _ = run_scan(cfg, total_time=2.0, noise_px=0.0)

    est = Estimator(cfg)
    est.InitWithSimDepths()
    dt = np.dtype(cfg.dtype)
    est.state = est.state._replace(
        last_gyro=jnp.asarray(gt["gyro0"], dt),
        last_accel=jnp.asarray(gt["accel0"], dt))
    est.vision_initialized = True
    est._last_prop_time = 0.0
    T = fi.frame_dt.shape[0]
    for t in range(T):
        est.state, out = est._step(
            est.state, fi.gyro[t], fi.accel[t], fi.imu_dt[t],
            fi.frame_dt[t], fi.meas_id[t], fi.meas_xp[t], fi.meas_depth[t],
            fi.meas_valid[t])
    assert np.allclose(np.asarray(est.state.X.Tsb),
                       np.asarray(outs.Tsb)[-1], atol=1e-9)


def test_float32_close_to_float64():
    cfg64 = config_from_json(PCW_CFG, dtype="float64",
                             sim_initialize_depths=True)
    cfg32 = config_from_json(PCW_CFG, dtype="float32",
                             sim_initialize_depths=True)
    _, o64, gt = run_scan(cfg64, total_time=4.0, noise_px=0.25)
    _, o32, _ = run_scan(cfg32, total_time=4.0, noise_px=0.25)
    e64 = np.linalg.norm(np.asarray(o64.Tsb) - gt["Tsb"], axis=1)
    e32 = np.linalg.norm(np.asarray(o32.Tsb) - gt["Tsb"], axis=1)
    rmse64 = np.sqrt(np.mean(e64 ** 2))
    rmse32 = np.sqrt(np.mean(e32 ** 2))
    assert rmse32 < max(2.0 * rmse64, 0.05), (rmse32, rmse64)


def test_batch_runner_matches_single():
    from xivo_tpu.runner import make_batch_runner, batch_states
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=1.5, noise_px=0.0)
    s1, o1, _ = run_scan(cfg, total_time=1.5, noise_px=0.0)

    B = 3
    states = batch_states(cfg, B)
    dt = np.dtype(cfg.dtype)
    states = states._replace(
        last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt), (B, 3)),
        last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt), (B, 3)))
    fib = jax.tree.map(lambda x: jnp.broadcast_to(
        x, (B,) + x.shape), fi)
    run = make_batch_runner(cfg)
    sb, ob = run(states, fib)
    for b in range(B):
        assert np.allclose(np.asarray(ob.Tsb)[b, -1],
                           np.asarray(o1.Tsb)[-1], atol=1e-9)


def test_admission_score_type_semantics():
    """comparison_score_type changes the candidate ranking per
    Criteria::CandidateComparison (src/options.cpp:35-61): a feature
    with tiny depth variance but huge XY variance outranks under
    DepthUncertainty yet loses under CovarianceDiagNorm; an
    outlier-count penalty flips a third pair."""
    import dataclasses
    import jax.numpy as jnp
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.filter.pipeline import _admission_score
    from xivo_tpu.filter.state import FS_READY, init_state

    cfg = config_from_json(PCW_CFG, dtype="float64")
    s = init_state(cfg)
    fr = s.features
    # row 0: depth var 0.01, xy var 100 ; row 1: depth var 0.02, xy var 0.02
    P0 = jnp.diag(jnp.asarray([100.0, 100.0, 0.01]))
    P1 = jnp.diag(jnp.asarray([0.02, 0.02, 0.02]))
    fr = fr._replace(
        Psub=fr.Psub.at[0].set(P0).at[1].set(P1),
        status=fr.status.at[0].set(FS_READY).at[1].set(FS_READY),
        outlier_counter=fr.outlier_counter.at[1].set(200.0))

    sc = _admission_score(cfg, fr)
    assert float(sc[0]) < float(sc[1])   # depth-only: row 0 wins

    cfg2 = dataclasses.replace(cfg,
                               comparison_score_type="CovarianceDiagNorm")
    sc2 = _admission_score(cfg2, fr)
    assert float(sc2[1]) < float(sc2[0])  # diag norm: row 1 wins

    # outlier penalty makes row 1's score much worse than plain norm
    cfg3 = dataclasses.replace(
        cfg, comparison_score_type="CovarianceDiagNormPlusOutlierCount")
    sc3 = _admission_score(cfg3, fr)
    assert float(sc3[1]) > float(sc2[1]) + 100.0
    assert float(sc3[0]) < float(sc3[1])  # penalty flips the pair back

    # invalid value rejected at config construction
    import pytest
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, comparison_score_type="bogus")


def test_clone_frame_groups_ate_parity():
    """Pose cloning must not cost trajectory accuracy (round-4 verdict
    item 1a: clone_frame_groups alone degraded ATE 0.0075 -> 0.0604 on
    the bench world). Root cause: instate-at-birth clones were
    trickle-admission anchors, letting lenient-phase features into the
    EKF at near-zero parallax and permanently poisoning the startup
    landmark map. With the clone slot class (GroupTable.is_clone +
    graduation through _admit_groups) admission cadence matches the
    non-cloning filter, so the ATEs must track each other."""
    kw = dict(dtype="float32", sim_initialize_depths=True,
              propagation_mode="fast", covariance_form="sqrt")
    ates = {}
    for name, over in (("base", {}), ("clone",
                                      {"clone_frame_groups": True})):
        cfg = config_from_json(PCW_CFG, **kw, **over)
        s, outs, gt = run_scan(cfg, total_time=5.0, noise_px=0.25)
        err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
        ates[name] = float(np.sqrt(np.mean(err ** 2)))
    # both track, and cloning costs at most 50% over base (pre-fix it
    # was 6.7x)
    assert ates["base"] < 0.05, ates
    assert ates["clone"] < max(1.5 * ates["base"], 0.02), ates


def test_recommended_config_tracks_base_ate():
    """The recommended accuracy config (bench consistency stage: OOS +
    cloning + pose-only FEJ, round-5 study) must stay at-or-near base
    accuracy on the bench world — measured 0.0084 vs base 0.0090 on
    CPU f32 (diag_stack_ate); this pins no-catastrophic-regression so
    the headline claim is checked on every default pytest run."""
    kw = dict(dtype="float32", sim_initialize_depths=True,
              propagation_mode="fast", covariance_form="sqrt")
    ates = {}
    for name, over in (("base", {}),
                       ("recommended", {"use_OOS": True,
                                        "clone_frame_groups": True,
                                        "use_fej": True})):
        cfg = config_from_json(PCW_CFG, **kw, **over)
        s, outs, gt = run_scan(cfg, total_time=5.0, noise_px=0.25)
        err = np.linalg.norm(np.asarray(outs.Tsb) - gt["Tsb"], axis=1)
        ates[name] = float(np.sqrt(np.mean(err ** 2)))
    assert ates["recommended"] < max(1.25 * ates["base"], 0.015), ates
