"""Multi-device scaling-efficiency measurement.

Runs the sharded multi-sequence VIO runner at mesh sizes 1..N and
reports frames/s + scaling efficiency (BASELINE target: >=70% at N>=2).
On this environment only one physical TPU is attached, so the default
run uses the emulated CPU mesh (XLA_FLAGS device count) to validate the
mechanism; on a real pod slice the same script measures true ICI
scaling — the filter is embarrassingly data-parallel, so the efficiency
loss is only collective-free dispatch overhead.

Usage: XIVO_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_scaling.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("XIVO_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["XIVO_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.runner import batch_states, make_sharded_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG


def measure(n_dev: int, seqs_per_dev: int, fi, gt, cfg,
            total_B: int = 0):
    """seqs_per_dev > 0: weak scaling (B = n * seqs_per_dev).
    total_B > 0: FIXED total batch sharded over n devices — on an
    emulated CPU mesh (shared physical cores) this is the meaningful
    check: throughput should stay ~flat as n grows, proving the
    shard_map machinery adds no overhead; weak-scaling efficiency
    there only measures core contention."""
    devs = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("data",))
    B = total_B if total_B else n_dev * seqs_per_dev

    def states():
        s = batch_states(cfg, B)
        dt = np.dtype(cfg.dtype)
        return s._replace(
            last_gyro=jnp.broadcast_to(
                jnp.asarray(gt["gyro0"], dt), (B, 3)).copy(),
            last_accel=jnp.broadcast_to(
                jnp.asarray(gt["accel0"], dt), (B, 3)).copy())

    fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
    run = make_sharded_runner(cfg, mesh)
    s, outs = run(states(), fib)
    jax.block_until_ready(outs.Tsb)
    # best-of-3: emulated meshes share physical cores with the host,
    # so single-shot walls are scheduler-noise-dominated
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, outs = run(states(), fib)
        jax.block_until_ready(outs.Tsb)
        wall = min(wall, time.perf_counter() - t0)
    T = int(fi.frame_dt.shape[0])
    return B * T / wall


def main():
    cfg = config_from_json(PCW_CFG, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast")
    fi, gt = build_pcw_stream(
        cfg, total_time=float(os.environ.get("SCALING_T", "2.0")))
    seqs_per_dev = int(os.environ.get("SCALING_SEQS", "4"))
    n_max = len(jax.devices())
    emulated = "CPU" in str(jax.devices()[0]).upper()
    results, flat = {}, {}
    for n in [1, 2, 4, n_max]:
        if n > n_max or n in results:
            continue
        results[n] = measure(n, seqs_per_dev, fi, gt, cfg)
        if emulated:
            # fixed total batch: sharding-overhead check (see measure)
            flat[n] = measure(n, 0, fi, gt, cfg, total_B=32)
    base = results[1]
    out = {
        "metric": "multi_device_scaling",
        "frames_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {str(k): round(v / (base * k), 3)
                       for k, v in results.items()},
        "platform": str(jax.devices()[0]),
    }
    if emulated:
        fb = flat[1]
        out["fixed_total_B32_fps"] = {str(k): round(v, 1)
                                      for k, v in flat.items()}
        out["sharding_overhead_vs_1dev"] = {
            str(k): round(1.0 - v / fb, 3) for k, v in flat.items()}
        out["note"] = (
            "emulated CPU devices share the same physical cores, so "
            "weak-scaling efficiency only measures core contention; "
            "the meaningful emulated check is the fixed-total-batch "
            "row — sharding_overhead ~0 proves the shard_map path "
            "adds nothing over the single-device program. The >=70% "
            "BASELINE target needs a real multi-chip slice "
            "(collective-free data parallelism: the per-device "
            "program is byte-identical to single-chip).")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
