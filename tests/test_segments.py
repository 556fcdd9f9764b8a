"""Closed-form VI initialization + segment-parallel trajectory processing.

Capabilities the reference lacks entirely: XIVO must start near-rest
with a known velocity prior (gravity init, src/estimator.cpp:439-473);
xivo_tpu can cold-start mid-motion (filter/vi_init.py) and process a
long trajectory as parallel overlapping segments fused by 4-DoF
alignment (dist/segments.py) — the VIO analogue of sequence
parallelism (SURVEY.md §2.6).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xivo_tpu.dist.segments import (plan_segments, run_segment_parallel,
                                    seed_segment_states, split_stream,
                                    yaw_translation_align)
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.filter.vi_init import vi_bootstrap
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


@pytest.fixture(scope="module")
def orbit_stream():
    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=24.0, noise_px=0.25,
                              motion="orbit")
    return cfg, fi, gt


def ate4(est, gtT):
    Rz, t = yaw_translation_align(gtT, est)
    e = (Rz @ est.T).T + t - gtT
    return float(np.sqrt(np.mean(np.sum(e ** 2, axis=1))))


def test_vi_bootstrap_depth_aided(orbit_stream):
    """Mid-motion cold start with depth hints: velocity to ~cm/s and
    gravity direction to a fraction of a degree, anywhere on the orbit."""
    cfg, fi, gt = orbit_stream
    s = init_state(cfg)
    for start in (0, 120, 240, 360):
        sl = jax.tree.map(lambda x: x[start:start + 16], fi)
        out = vi_bootstrap(cfg, s.cam, sl.gyro, sl.accel, sl.imu_dt,
                           sl.frame_dt, sl.meas_id, sl.meas_xp,
                           sl.meas_valid, meas_depth=sl.meas_depth)
        R0 = gt["Rsb"][start]
        v_true = R0.T @ gt["Vsb"][start]
        g_true = R0.T @ np.array([0, 0, -9.8])
        assert np.linalg.norm(np.asarray(out.v0) - v_true) < 0.05, start
        assert np.linalg.norm(np.asarray(out.g_b0) - g_true) < 0.08, start
        assert bool(out.cond_ok)


def test_vi_bootstrap_visual_only(orbit_stream):
    """Without depths (pure monocular + IMU): the Martinelli system with
    ||g||-constrained refinement still recovers velocity to a few dm/s —
    enough to open the right prior (the reference cannot do this at all)."""
    cfg, fi, gt = orbit_stream
    s = init_state(cfg)
    errs = []
    for start in (0, 240):
        sl = jax.tree.map(lambda x: x[start:start + 24], fi)
        out = vi_bootstrap(cfg, s.cam, sl.gyro, sl.accel, sl.imu_dt,
                           sl.frame_dt, sl.meas_id, sl.meas_xp,
                           sl.meas_valid)
        R0 = gt["Rsb"][start]
        v_true = R0.T @ gt["Vsb"][start]
        errs.append(np.linalg.norm(np.asarray(out.v0) - v_true))
    # truth speed is ~1.0 m/s; a v=0 guess would err by ~1.0
    assert np.mean(errs) < 0.5, errs


@pytest.mark.slow
def test_segment_parallel_matches_sequential(orbit_stream):
    """4 overlapping segments, each cold-started by the closed-form init,
    run as one vmapped batch and fused: ATE within 5x of the
    true-velocity-seeded sequential run (and ~20x better than the naive
    v=0 cold start, which locks its gauge to a bad hypothesis)."""
    cfg, fi, gt = orbit_stream
    fused, outs = run_segment_parallel(cfg, fi, n_segments=4, overlap=20,
                                       boot_frames=16)
    a = ate4(fused, gt["Tsb"])
    assert a < 0.10, a
    # every segment tracked through its core region (the last frames of
    # the final segment are stream padding, so check at the core end)
    plan = plan_segments(fi.frame_dt.shape[0], 4, 20)
    ni = np.asarray(outs.num_instate_features)
    for k in range(4):
        assert ni[k, plan.core_len - 1] > 10, (k, ni[k, plan.core_len - 1])


@pytest.mark.slow
def test_seeded_sequential_beats_cold_start(orbit_stream):
    """Single-segment use of the seeder: a mid-motion start with the
    closed-form init tracks ~10x tighter than the v=0 cold start."""
    cfg, fi, gt = orbit_stream
    run = make_sequence_runner(cfg)
    fid = jax.tree.map(jnp.asarray, fi)

    s_cold = init_state(cfg)
    s_cold = s_cold._replace(last_gyro=jnp.asarray(gt["gyro0"]),
                             last_accel=jnp.asarray(gt["accel0"]))
    _, o_cold = run(s_cold, fid)

    plan = plan_segments(fi.frame_dt.shape[0], 1, 0)
    fis = split_stream(fi, plan)
    s_seed = jax.tree.map(lambda x: x[0],
                          seed_segment_states(cfg, fis, boot_frames=16))
    _, o_seed = run(s_seed, fid)

    a_cold = ate4(np.asarray(o_cold.Tsb), gt["Tsb"])
    a_seed = ate4(np.asarray(o_seed.Tsb), gt["Tsb"])
    assert a_seed < 0.1, a_seed
    assert a_seed < 0.3 * a_cold, (a_seed, a_cold)
