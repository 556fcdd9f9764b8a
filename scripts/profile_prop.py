"""A/B the propagation modes (fast while-loop vs batched static grid)
at bench batch size on a loaded filter."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter import pipeline as pl
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.propagate_batched import propagate_frame_batched
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))
REPS = 100

cfg = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                       propagation_mode="fast")
cfg_b = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                         propagation_mode="batched", total_substeps=int(os.environ.get("TOTAL_SUBSTEPS", "64")), max_substeps=4)
fi, gt = build_pcw_stream(cfg, total_time=4.0, noise_px=0.25)
s0 = batch_states(cfg, B)
dtt = np.dtype(cfg.dtype)
s0 = s0._replace(
    last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dtt), (B, 3)).copy(),
    last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dtt),
                                (B, 3)).copy())
fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
run = make_batch_runner(cfg)
s, outs = run(s0, fib)
print("loaded")

T = fi.frame_dt.shape[0]
k = T - 1
inp = jax.tree.map(lambda x: jnp.broadcast_to(x[k], (B,) + x[k].shape), fi)


@jax.jit
def _probe(x):
    return jnp.sum(x[0, :2])


z8 = jnp.ones((8, 8), jnp.float32)
float(_probe(z8))
t0 = time.perf_counter()
for _ in range(5):
    float(_probe(z8))
RTT = (time.perf_counter() - t0) / 5
print(f"RTT {RTT*1e3:.1f} ms")


def timeit(name, fn):
    def body2(ss, _):
        return jax.vmap(fn)(ss), None

    @jax.jit
    def loop(ss):
        out, _ = jax.lax.scan(body2, ss, None, length=REPS)
        return sum(jnp.sum(l[:1].astype(jnp.float32))
                   for l in jax.tree.leaves(out))

    float(loop(s))
    t0 = time.perf_counter()
    float(loop(s))
    wall = (time.perf_counter() - t0 - RTT) / REPS * 1e3
    print(f"{name:44s} {wall:8.3f} ms/frame-batch")
    return wall


def prop_fast(ss):
    return pl._propagate_frame_fast(cfg, ss, inp.gyro[0], inp.accel[0],
                                    inp.imu_dt[0], inp.frame_dt[0])


def prop_batched(ss):
    return propagate_frame_batched(cfg_b, ss, inp.gyro[0],
                                   inp.accel[0], inp.imu_dt[0],
                                   inp.frame_dt[0])


# NOTE: fns above close over UNBATCHED frame inputs (row 0) — same work
# for every batch element, which is what the bench does anyway.
timeit("propagate fast (while-loop)", prop_fast)
timeit("propagate batched (static grid)", prop_batched)
print("imu axis:", inp.imu_dt.shape, "total_substeps:", cfg_b.total_substeps,
      "max_substeps:", cfg_b.max_substeps)
