"""Sigma-bound / calibration-convergence plots from a state dump.

The analysis tail of the saver lattice (reference:
scripts/calibration_plots.py + accuracy_plots.py): reads a
StateDumpWriter JSON (written with save_cov=True), plots each
calibration block's estimate with its +-3 sigma envelope, and prints
the within-3-sigma consistency fractions. With no dump on disk, runs a
short PCW simulation first (self-contained demo mode).

Usage:
  XIVO_PLATFORM=cpu python scripts/calibration_plots.py [dump.json]
      [-out plots/] [-blocks Tsb,Vsb,bg,ba,Tbc,td]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def make_demo_dump(path: str, total_time=6.0):
    """Run a short PCW sim through the API with a covariance dump."""
    from xivo_tpu.api import Estimator
    from xivo_tpu.io.savers import StateDumpWriter
    from xivo_tpu.filter.config import config_from_json
    from xivo_tpu.sim.stream import build_pcw_stream
    from tests.test_e2e_pcw import PCW_CFG

    cfg = config_from_json(PCW_CFG, dtype="float64",
                           sim_initialize_depths=True)
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25)
    est = Estimator(cfg)
    est.InitWithSimDepths()
    est.state = est.state._replace(
        last_gyro=np.asarray(gt["gyro0"]),
        last_accel=np.asarray(gt["accel0"]))
    dump = StateDumpWriter(path, save_cov=True)
    t = 0.0
    for k in range(fi.frame_dt.shape[0]):
        for i in range(fi.gyro.shape[1]):
            if float(fi.imu_dt[k, i]) > 0:
                t += float(fi.imu_dt[k, i])
                est.InertialMeas(t, np.asarray(fi.gyro[k, i]),
                                 np.asarray(fi.accel[k, i]))
        t += float(fi.frame_dt[k])
        n = int(fi.meas_valid[k].sum())
        xpd = np.concatenate([np.asarray(fi.meas_xp[k, :n]),
                              np.asarray(fi.meas_depth[k, :n, None])],
                             axis=1)
        est.VisualMeasPointCloud(t, np.asarray(fi.meas_id[k, :n]), xpd)
        dump.add(t, est)
    dump.write()
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", nargs="?", default="out/state_dump.json")
    ap.add_argument("-out", default="out/plots")
    ap.add_argument("-blocks", default="Tsb,Vsb,bg,ba,Tbc,td")
    args = ap.parse_args()

    if not os.path.exists(args.dump):
        print(f"no dump at {args.dump}; running demo PCW sim ...")
        make_demo_dump(args.dump)

    from xivo_tpu.eval.estimator_data import EstimatorData
    ed = EstimatorData(args.dump)
    os.makedirs(args.out, exist_ok=True)

    for block in args.blocks.split(","):
        x = ed.state(block)
        sig = ed.sigma(block)
        k = x.shape[1]
        fig, axes = plt.subplots(k, 1, figsize=(8, 2.2 * k), sharex=True,
                                 squeeze=False)
        for a in range(k):
            ax = axes[a, 0]
            ax.plot(ed.ts, x[:, a], lw=1.0, label=f"{block}[{a}]")
            ax.fill_between(ed.ts, x[:, a] - 3 * sig[:, a],
                            x[:, a] + 3 * sig[:, a], alpha=0.25,
                            label="±3σ")
            ax.legend(loc="upper right", fontsize=7)
        axes[-1, 0].set_xlabel("t [s]")
        fig.suptitle(f"{block} with ±3σ envelope")
        out = os.path.join(args.out, f"calib_{block}.png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out}  (final σ: "
              f"{np.array2string(sig[-1], precision=5)})")


if __name__ == "__main__":
    main()
