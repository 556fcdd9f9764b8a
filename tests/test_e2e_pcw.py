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

PCW_CFG = {
    "simulation": True,
    "integration_method": "PrinceDormand",
    "PrinceDormand": {"stepsize": 0.002},
    "use_MH_gating": True,
    "max_group_lifetime": 60,
    "group_degrees_fixed": 6,
    "gravity": [0, 0, -9.8],
    "X": {"Wsb": [0, 0, 0], "Tsb": [0, 0, 0], "Vsb": [0, 0, 0],
          "bg": [0, 0, 0], "ba": [0, 0, 0],
          "Wbc": [-1.57079633, 0, 0], "Tbc": [0, 0, 0], "Wsg": [0, 0]},
    "P": {"Wsb": 0.001, "Tsb": 0.001, "Vsb": 0.5, "bg": 1e-10, "ba": 1e-10,
          "Wbc": 1e-10, "Tbc": 1e-10, "Wsg": 1e-10},
    "Qmodel": {"Wsb": 0.01, "Wbc": 0, "Wsg": 0},
    "Qimu": {"gyro": [5e-3] * 3, "gyro_bias": [0.0] * 3,
             "accel": [5e-2] * 3, "accel_bias": [0.0] * 3},
    "initial_z": 2.5, "initial_std_x": 1.0, "initial_std_y": 1.0,
    "initial_std_z": 0.5,
    "visual_meas_std": 1.0,
    "max_depth": 30.0, "min_depth": 0.05,
    "subfilter": {"visual_meas_std": 3.5, "ready_steps": 2,
                  "MH_thresh": 8.991},
    "min_inliers": 15, "MH_thresh": 100.0, "MH_adjust_factor": 1.15,
    "num_gauge_xy_features": 3,
    "camera_cfg": {"model": "pinhole", "rows": 480, "cols": 640,
                   "fx": 275, "fy": 275, "cx": 320, "cy": 240},
    "tracker_cfg": {"num_features_min": 150, "num_features_max": 200,
                    "max_pixel_displacement": 500},
}


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
