"""Long-horizon image-mapped pipeline pins (VERDICT r2 #10).

The full composition — LK/FAST/BRIEF front-end, EKF, BigMap retirement
with observation history, descriptor loop closure, refine_map BA —
driven long-form by scripts/run_longhorizon_mapped.py. The honest
finding of the round-3 study (ARCHITECTURE.md): on procedurally
textured synthetic worlds, BRIEF-family descriptors across lap-to-lap
viewpoint wander rarely clear strict match thresholds, and at loose
thresholds aliased texture produces GEOMETRICALLY-CONSISTENT false
closures — so the property this suite pins is the one that decides
whether the map may be on at all:

  * loop closures FIRE on revisit at a loose threshold (mechanism);
  * UNGATED they diverge the filter (measured 2.2 m vs 0.04 m RMSE);
  * the chi-square innovation gate (lc_MH_thresh) keeps the same
    configuration at baseline accuracy.

Positive ATE reduction from LC is expected on real imagery
(distinctive descriptors) or much longer horizons; the study script
measures it with -ab.
"""
import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: XIVO_SLOW=1 runs these

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_arm(**kw):
    spec = importlib.util.spec_from_file_location(
        "lh", os.path.join(ROOT, "scripts", "run_longhorizon_mapped.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.run_arm(**kw)


COMMON = dict(total_time=24.0, motion="orbit", nn_thresh=75,
              noise_gyro=3e-3, noise_accel=2e-2, refine_every=10.0,
              lc_min_matches=5, dtype="float64")


@pytest.fixture(scope="module")
def arms():
    base = _run_arm(use_lc=False, **COMMON)
    ungated = _run_arm(use_lc=True, lc_MH_thresh=0.0, **COMMON)
    gated = _run_arm(use_lc=True, **COMMON)  # lc_MH_thresh default on
    return base, ungated, gated


def test_loop_closures_fire_on_revisit(arms):
    base, ungated, gated = arms
    # the orbit revisits after ~14 s; the loose-threshold arm must see
    # closures (mechanism: retirement -> map -> match -> P3P -> rows)
    assert ungated["n_lc"] > 0, ungated
    assert base["n_lc"] == 0
    assert ungated["map_count"] > 20


def test_ungated_false_closures_diverge(arms):
    """Why the innovation gate exists: aliased-texture matches that
    survive P3P still disagree with the state; applied ungated they
    bend the trajectory by an order of magnitude."""
    base, ungated, gated = arms
    assert ungated["rmse"] > 3.0 * base["rmse"], (ungated, base)


def test_gated_lc_preserves_accuracy(arms):
    """With the chi-square gate (default), the same loose-threshold LC
    configuration stays at baseline accuracy — the map can be ON
    without risking the filter."""
    base, ungated, gated = arms
    assert gated["rmse"] < 1.3 * base["rmse"], (gated, base)
    assert np.isfinite(gated["rmse"])


def test_refine_map_runs_in_stream(arms):
    _, _, gated = arms
    assert gated["n_refine"] >= 1


# ---------------------------------------------------------------------
# Loop closure PAYS (round-3 verdict #3): kidnap-style drift injection.
#
# A free-running arm cannot demonstrate a net LC win at feasible sim
# horizons (white-noise IMU + bias estimation keep drift at the noise
# floor, and the chi-square gate correctly keeps only agree-with-state
# closures). The kidnap protocol makes the map's value measurable: the
# ENTIRE live window (pose, velocity, groups, FEJ, OC chain) is offset
# by a global transform mid-run — internally consistent, invisible to
# tracking (features are group-anchored), correctable ONLY by the
# pre-kick map — with the covariance inflated along the global-
# transform nullspace (common-mode across the window). The no-LC arm
# must carry the offset forever; the mapped arm snaps back within a
# frame (measured: |dT| 0.369 -> 0.106 one frame after the kick).

KIDNAP = dict(total_time=26.0, motion="loop", markers=True,
              kick_time=16.0, dtype="float64",
              lc_keyframe_every=8, lc_min_age_frames=120)


@pytest.fixture(scope="module")
def kidnap_arms():
    lc = _run_arm(use_lc=True, **KIDNAP)
    base = _run_arm(use_lc=False, **KIDNAP)
    return lc, base


def test_kidnap_unmapped_cannot_recover(kidnap_arms):
    lc, base = kidnap_arms
    # kick |T| = 0.44 m: tracking alone holds the offset indefinitely
    assert base["post_kick_rmse"] > 0.25, base


def test_kidnap_recovery_with_map(kidnap_arms):
    """ATE(mapped) < ATE(unmapped): the map measurably removes drift
    the filter cannot observe — Mapper's purpose
    (src/mapper.cpp:335-418)."""
    lc, base = kidnap_arms
    assert lc["n_lc"] > 50, lc
    # measured (32 s study): lc 0.181 vs base 0.409 (-56%); 0.65 gives
    # seed margin while still pinning a >1.5x improvement
    assert lc["post_kick_rmse"] < 0.65 * base["post_kick_rmse"], \
        (lc, base)
    assert lc["aligned_ate"] < base["aligned_ate"], (lc, base)


# ---------------------------------------------------------------------
# Loop closure pays under NATURAL drift (round-4 verdict item 3): no
# kidnap injection — the drift is real accumulation from random-walk
# IMU biases (sim/imu_sim.py bias walks, matching the filter's Qimu
# model) on a loop whose radius exceeds the vision range, so the anchor
# topology breaks every lap (motion="bigloop" + tube world + max_z=6:
# a 2 m loop never drifts, some landmark chain always survives).
# ---------------------------------------------------------------------

def test_free_running_natural_drift_lc_win():
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "dk", os.path.join(ROOT, "scripts", "diag_kidnap_pcw.py"))
    dk = _ilu.module_from_spec(spec)
    spec.loader.exec_module(dk)
    kw = dict(total_time=45.0, kick_time=0.0, motion="bigloop",
              world="tube", max_z=6.0,
              bias_walk_gyro=1e-3, bias_walk_accel=1e-2)
    lc = dk.run(True, **kw)
    base = dk.run(False, **kw)
    # drift really accumulates without the map
    assert base["tail_rmse"] > 0.015, base
    assert base["n_lc"] == 0
    # closures fire on revisit and remove it: measured tail 0.0133 vs
    # 0.0272 (2.0x), final 0.023 vs 0.043
    assert lc["n_lc"] > 500, lc
    assert lc["tail_rmse"] < 0.7 * base["tail_rmse"], (lc, base)
    assert lc["final"] < 0.7 * base["final"], (lc, base)
    assert lc["rmse"] <= 1.1 * base["rmse"], (lc, base)
