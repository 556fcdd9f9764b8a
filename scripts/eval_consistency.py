"""Consistency study: FEJ / OC-EKF effect on extrinsics error and NEES.

Runs the 25 s sustained-visibility tube-world scenario (the one where
linearization-point drift, not starvation, dominates) with true
extrinsics offset from the initial guess, for the four combinations of
{use_fej, use_oc}, and reports:

  * Tsb ATE-RMSE (trajectory accuracy)
  * final Tbc error (extrinsics convergence)
  * Tbc NEES mean over the run (consistency: ~3 is ideal for a 3-dof
    block; large values = overconfidence)

Usage: XIVO_PLATFORM=cpu python scripts/eval_consistency.py [-total_time 25]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter import layout as L
from xivo_tpu.filter import pipeline as pl
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def run_case(total_time, use_fej, use_oc, true_Tbc, true_Wbc, **extra):
    from xivo_tpu.geom import so3
    cfg = config_from_json(
        dict(PCW_CFG,
             P=dict(PCW_CFG["P"], Wbc=0.03, Tbc=0.05)),
        dtype="float64", sim_initialize_depths=True,
        propagation_mode="fast", use_fej=use_fej, use_oc=use_oc, **extra)
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25,
                              motion="calib_rich", world="tube",
                              true_Tbc=true_Tbc,
                              true_Rbc=np.asarray(
                                  so3.exp(jnp.asarray(true_Wbc))))
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))

    def step(s, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        s, out = pl.vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep,
                              mval)
        tbc_err = s.X.Tbc - jnp.asarray(true_Tbc, dt)
        Ptbc = s.P[L.TBC:L.TBC + 3, L.TBC:L.TBC + 3]
        nees = tbc_err @ jnp.linalg.solve(
            Ptbc + 1e-18 * jnp.eye(3, dtype=dt), tbc_err)
        return s, (out.Tsb, s.X.Tbc, nees)

    import functools
    scan = jax.jit(functools.partial(jax.lax.scan, step))
    s, (Tsb, Tbc, nees) = scan(s, (fi.gyro, fi.accel, fi.imu_dt,
                                   fi.frame_dt, fi.meas_id, fi.meas_xp,
                                   fi.meas_depth, fi.meas_valid))
    Tsb = np.asarray(Tsb)
    ate = float(np.sqrt(np.mean(
        np.sum((Tsb - gt["Tsb"]) ** 2, axis=1))))
    tbc_final = float(np.linalg.norm(np.asarray(Tbc)[-1] - true_Tbc))
    # skip the initial transient for the NEES statistic
    n = np.asarray(nees)
    nees_mean = float(np.mean(n[len(n) // 5:]))
    return ate, tbc_final, nees_mean


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-total_time", type=float, default=25.0)
    args = ap.parse_args()
    true_Tbc = np.array([0.03, -0.02, 0.04])
    true_Wbc = np.array([-1.57079633 + 0.02, -0.015, 0.01])
    print(f"{'case':16s} {'ATE-RMSE':>10s} {'Tbc err':>10s} {'Tbc NEES':>10s}")
    cases = [
        (dict(use_fej=False, use_oc=False), "base"),
        (dict(use_fej=True, use_oc=False), "fej"),
        (dict(use_fej=False, use_oc=True), "oc"),
        (dict(use_fej=True, use_oc=True), "fej+oc"),
        (dict(use_fej=True, use_oc=True,
              approximate_init_covariance=True), "fej+oc+initcov"),
        (dict(use_fej=True, use_oc=True,
              approximate_init_covariance=True,
              use_OOS=True), "fej+oc+ic+oos"),
    ]
    for kw, name in cases:
        ate, tbce, nees = run_case(args.total_time, true_Tbc=true_Tbc,
                                   true_Wbc=true_Wbc, **kw)
        print(f"{name:16s} {ate:10.4f} {tbce:10.4f} {nees:10.1f}")


if __name__ == "__main__":
    main()
