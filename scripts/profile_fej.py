"""Bisect the use_fej + approximate_init_covariance device cost
(round-4 verdict item 1b / ARCHITECTURE round-5 roadmap #2).

Runs the bench PCW world at B=256 on the current backend with the two
knobs toggled independently and prints wall/rep for each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from xivo_tpu.sim.configs import PCW_CFG

B = int(os.environ.get("B", "256"))

VARIANTS = [
    ("base", {}),
    ("fej", {"use_fej": True}),
    ("init_cov", {"approximate_init_covariance": True}),
    ("fej+init_cov", {"use_fej": True,
                      "approximate_init_covariance": True}),
]
if os.environ.get("VARIANTS"):
    keep = os.environ["VARIANTS"].split(",")
    VARIANTS = [v for v in VARIANTS if v[0] in keep]

for name, over in VARIANTS:
    cfg = config_from_json(PCW_CFG, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast",
                           covariance_form="sqrt", **over)
    fi, gt = build_pcw_stream(cfg, total_time=5.0, noise_px=0.25)
    T = int(fi.frame_dt.shape[0])

    def fresh():
        s = batch_states(cfg, B)
        dt = np.dtype(cfg.dtype)
        return s._replace(
            last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt),
                                       (B, 3)).copy(),
            last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt),
                                        (B, 3)).copy())

    fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
    run = make_batch_runner(cfg)
    t0 = time.time()
    s, outs = run(fresh(), fib)
    jax.block_until_ready(outs.Tsb)
    compile_s = time.time() - t0
    err = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))

    walls = []
    for _ in range(2):
        st = fresh()
        jax.block_until_ready(st.P)
        t0 = time.perf_counter()
        s, outs = run(st, fib)
        jax.block_until_ready(outs.Tsb)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    print(f"{name:14s} wall/rep {wall:7.3f}s  fps {B*T/wall:8.1f}  "
          f"ATE {ate:.4f}  (compile {compile_s:.0f}s)", flush=True)

# full-consistency variant (opt-in): use_OOS + clone + fej + init_cov
if os.environ.get("FULLSTACK"):
    cfg = config_from_json(PCW_CFG, dtype="float32",
                           sim_initialize_depths=True,
                           propagation_mode="fast",
                           covariance_form="sqrt", use_OOS=True,
                           clone_frame_groups=True,
                           use_fej=os.environ.get("NOFEJ") != "1",
                           approximate_init_covariance=True,
                           use_compression=os.environ.get(
                               "NOCOMPRESS") != "1")
    fi, gt = build_pcw_stream(cfg, total_time=5.0, noise_px=0.25)
    T = int(fi.frame_dt.shape[0])

    def fresh():
        s = batch_states(cfg, B)
        dt = np.dtype(cfg.dtype)
        return s._replace(
            last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt),
                                       (B, 3)).copy(),
            last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt),
                                        (B, 3)).copy())

    fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
    run = make_batch_runner(cfg)
    import time as _t
    t0 = _t.time()
    s, outs = run(fresh(), fib)
    jax.block_until_ready(outs.Tsb)
    comp = _t.time() - t0
    err = np.linalg.norm(np.asarray(outs.Tsb)[0] - gt["Tsb"], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    walls = []
    for _ in range(2):
        st = fresh()
        jax.block_until_ready(st.P)
        t0 = _t.perf_counter()
        s, outs = run(st, fib)
        jax.block_until_ready(outs.Tsb)
        walls.append(_t.perf_counter() - t0)
    wall = min(walls)
    print(f"fullstack      wall/rep {wall:7.3f}s  fps {B*T/wall:8.1f}  "
          f"ATE {ate:.4f}  (compile {comp:.0f}s)", flush=True)
