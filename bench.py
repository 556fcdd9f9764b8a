"""Benchmark: multi-sequence PCW VIO throughput on one chip.

Prints ONE JSON line: frames/s/chip for the full filter pipeline
(IMU propagation + tracker + EKF update per frame), batched over
independent sequences — the throughput axis defined in SURVEY.md §2.6.
Baseline: the reference's 140 FPS single-core replay (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# EKF covariance algebra needs true fp32 matmuls; the TPU default
# (bfloat16 passes) destroys the conditioning of P
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def main():
    # measured batch sweep on v5e (frames/s/chip), post gather-purge:
    # 128 -> 10940, 256 -> 11493, 512 -> 11470 — saturates ~256
    B = int(os.environ.get("BENCH_BATCH", "256"))
    total_time = float(os.environ.get("BENCH_SECONDS", "5.0"))

    cfg = config_from_json(
        PCW_CFG, dtype="float32", sim_initialize_depths=True,
        propagation_mode=os.environ.get("BENCH_PROP", "fast"))
    fi, gt = build_pcw_stream(cfg, total_time=total_time, noise_px=0.25)
    T = int(fi.frame_dt.shape[0])

    def fresh_states():
        s = batch_states(cfg, B)
        dt = np.dtype(cfg.dtype)
        return s._replace(
            last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt),
                                       (B, 3)).copy(),
            last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt),
                                        (B, 3)).copy())

    fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
    run = make_batch_runner(cfg)

    # warmup/compile
    s, outs = run(fresh_states(), fib)
    jax.block_until_ready(outs.Tsb)

    # sanity: the filter must actually track, not just run
    err = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    rmse = float(np.sqrt(np.mean(err ** 2)))

    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        s, outs = run(fresh_states(), fib)
    jax.block_until_ready(outs.Tsb)
    wall = (time.perf_counter() - t0) / reps

    fps = B * T / wall
    baseline = 140.0
    print(json.dumps({
        "metric": "pcw_vio_frames_per_s_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3),
        "batch": B, "frames": T, "wall_s": round(wall, 3),
        "ate_rmse_m": round(rmse, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
