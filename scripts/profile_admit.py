"""Direct dispatch-loop timing of admission internals (scratch)."""
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
from xivo_tpu.filter import layout as L
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.update import zero_state_entries
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))

cfg = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                       propagation_mode="fast")
fi, gt = build_pcw_stream(cfg, total_time=4.0, noise_px=0.25)
s0 = batch_states(cfg, B)
dt = np.dtype(cfg.dtype)
s0 = s0._replace(
    last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt), (B, 3)).copy(),
    last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt), (B, 3)).copy())
fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
run = make_batch_runner(cfg)
s, outs = run(s0, fib)
jax.block_until_ready(s.P)
print("loaded; instate =", int(outs.num_instate_features[0, -1]))


def timeit(name, fn, *args, n=50):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    wall = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {wall:8.3f} ms")
    return wall


d = cfg.dims
NG, NF, G, F = d.ng_rows, d.nf_rows, d.n_groups, d.n_features

timeit("admit_groups (whole)", lambda s: pl._admit_groups(cfg, s)[0], s)
timeit("admit_features_within (whole)",
       lambda s: pl._admit_features_within_groups(cfg, s)[0], s)
timeit("process_tracks (whole)", lambda s: pl._process_tracks(cfg, s)[0], s)
timeit("candidate_mask", lambda s: pl._candidate_mask(cfg, s), s)


def sub_rank(s):
    fr = s.features
    cand = pl._candidate_mask(cfg, s)
    return pl._rank_assign(s.f2row < 0, cand, pl._admission_score(fr))


timeit("rank_assign", sub_rank, s)


def sub_commit(s):
    fr = s.features
    cand = pl._candidate_mask(cfg, s)
    slot_of_row, got = pl._rank_assign(s.f2row < 0, cand,
                                       pl._admission_score(fr))
    return pl._commit_feature_admissions(cfg, s, slot_of_row, got)[0]


timeit("rank_assign + commit", sub_commit, s)


def sub_zero(s):
    mask = jnp.zeros((F,), bool).at[0].set(True)
    keep = pl._feature_keep_vector(cfg, mask, s.P.dtype) > 0
    return zero_state_entries(s.P, keep)


timeit("zero_state_entries", sub_zero, s)


def sub_addblocks(s):
    mask = jnp.zeros((F,), bool).at[:3].set(True)
    rows = jnp.arange(F, dtype=jnp.int32)
    return pl._add_feature_blocks(cfg, s.P, s.features, mask, rows)


timeit("add_feature_blocks", sub_addblocks, s)


def sub_pcong(s):
    idx = jnp.arange(d.full)
    return s.P[idx][:, idx]


timeit("P congruence gather", sub_pcong, s)
