"""Run the PCW simulation VIO and evaluate ATE/RPE.

Port of scripts/run_and_eval_pyxivo_pcw.py: run the filter on the
synthetic world, then compute ATE (Horn alignment) and RPE@1s against
the exact ground truth using the TUM protocol (eval/metrics.py).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("XIVO_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["XIVO_PLATFORM"])
    if os.environ["XIVO_PLATFORM"] == "cpu":
        jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp
import numpy as np

from xivo_tpu.eval import ate_rmse, rpe
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import init_state
from xivo_tpu.runner import make_sequence_runner
from xivo_tpu.sim.stream import build_pcw_stream


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-total_time", type=float, default=20.0)
    ap.add_argument("-motion", type=str, default="gentle")
    ap.add_argument("-noise_px", type=float, default=0.5)
    ap.add_argument("-use_sim_depth", action="store_true")
    ap.add_argument("-dtype", type=str, default="float32")
    ap.add_argument("-propagation", type=str, default="fast")
    ap.add_argument("-stdout", action="store_true")
    ap.add_argument("-out", type=str, default="pcw_bench")
    args = ap.parse_args()

    from scripts.run_pcw import PCW_CFG
    cfg = config_from_json(PCW_CFG, dtype=args.dtype,
                           sim_initialize_depths=args.use_sim_depth,
                           propagation_mode=args.propagation)
    fi, gt = build_pcw_stream(cfg, total_time=args.total_time,
                              motion=args.motion, noise_px=args.noise_px)
    s = init_state(cfg)
    dt = np.dtype(cfg.dtype)
    s = s._replace(last_gyro=jnp.asarray(gt["gyro0"], dt),
                   last_accel=jnp.asarray(gt["accel0"], dt))
    run = make_sequence_runner(cfg)
    t0 = time.time()
    s, outs = run(s, fi)
    jax.block_until_ready(outs.Tsb)
    wall = time.time() - t0
    T = len(gt["t"])

    a_rmse, n_pairs, _ = ate_rmse(gt["t"], np.asarray(outs.Tsb),
                                  gt["t"], gt["Tsb"], max_difference=0.001)
    tr, rot, n_rpe = rpe(gt["t"], np.asarray(outs.Rsb),
                         np.asarray(outs.Tsb), gt["t"], gt["Rsb"],
                         gt["Tsb"], delta=1.0)
    lines = [
        f"compared_pose_pairs {n_pairs} pairs",
        f"absolute_translational_error.rmse {a_rmse:.6f} m",
        f"compared_pose_pairs {n_rpe} pairs",
        f"translational_error.rmse {tr:.6f} m",
        f"rotational_error.rmse {rot:.6f} deg",
        f"frames {T} wall {wall:.2f} s fps {T / wall:.1f}",
    ]
    text = "\n".join(lines)
    if args.stdout:
        print(text)
    else:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(text)


if __name__ == "__main__":
    main()
