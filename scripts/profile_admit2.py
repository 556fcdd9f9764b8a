"""Reliable ablation of the admission path (scratch)."""
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

from xivo_tpu.filter import layout as L
from xivo_tpu.filter import pipeline as pl
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.state import FS_INSTATE
from xivo_tpu.filter.update import zero_state_entries
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))
REPS = 100

cfg = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                       propagation_mode="fast")
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


d = cfg.dims
NG, NF, G, F = d.ng_rows, d.nf_rows, d.n_groups, d.n_features


def eligibility(s):
    fr, gr = s.features, s.groups
    cand = pl._candidate_mask(cfg, s) & (fr.status == 2)  # FS_READY
    ref_oh = (fr.ref[:, None] == jnp.arange(NG)[None, :]) & cand[:, None]
    n_cand = jnp.sum(ref_oh, axis=0)
    free_fslots = jnp.sum((s.f2row < 0).astype(jnp.int32))
    free_gslots = jnp.sum((s.g2row < 0).astype(jnp.int32))
    eligible = gr.active & (gr.sind < 0) \
        & (n_cand >= cfg.num_gauge_xy_features)
    order = jnp.argsort(jnp.where(eligible, -n_cand, 1))
    demand = jnp.where(eligible, n_cand, 0)[order]
    cum_before = jnp.cumsum(demand) - demand
    rank = jnp.arange(NG)
    take_sorted = eligible[order] & (rank < free_gslots) \
        & (rank < cfg.max_group_admissions) \
        & (cum_before < jnp.maximum(
            free_fslots - max(cfg.num_gauge_xy_features, 1) + 1, 0))
    take = jnp.zeros((NG,), bool).at[order].set(take_sorted)
    return cand, n_cand, take


def v_elig(s):
    cand, n_cand, take = eligibility(s)
    fr = s.features
    return s._replace(features=fr._replace(
        lifetime=fr.lifetime + take[jnp.clip(fr.ref, 0, NG - 1)]
        .astype(fr.lifetime.dtype) * 0))


def v_gslot(s):
    cand, n_cand, take = eligibility(s)
    gslot_of_row, got_g = pl._rank_assign(
        s.g2row < 0, take, -n_cand.astype(s.P.dtype))
    tgt = jnp.where(got_g, gslot_of_row, G)
    g2row = s.g2row.at[tgt].set(jnp.arange(NG, dtype=jnp.int32))
    return s._replace(g2row=g2row * 1)


def v_pcong(s):
    cand, n_cand, take = eligibility(s)
    gslot_of_row, got_g = pl._rank_assign(
        s.g2row < 0, take, -n_cand.astype(s.P.dtype))
    tgt = jnp.where(got_g, gslot_of_row, G)
    new_slot = jnp.zeros((G,), bool).at[tgt].set(True)
    base = jnp.arange(d.full)
    within = (base - L.GROUP_BEGIN) % 6
    slot_of_entry = jnp.clip((base - L.GROUP_BEGIN) // 6, 0, G - 1)
    src_motion = jnp.where(within < 3, L.WSB + within,
                           L.TSB + (within - 3))
    in_group_region = (base >= L.GROUP_BEGIN) \
        & (base < L.GROUP_BEGIN + 6 * G)
    idx = jnp.where(in_group_region & new_slot[slot_of_entry],
                    src_motion, base)
    P = s.P[idx][:, idx]
    return s._replace(P=P)


def v_featrank(s):
    cand, n_cand, take = eligibility(s)
    fr = s.features
    want = cand & take[jnp.clip(fr.ref, 0, NG - 1)] & (fr.ref >= 0)
    slot_of_row, got = pl._rank_assign(
        s.f2row < 0, want, pl._admission_score(fr))
    return s._replace(f2row=s.f2row + 0 * jnp.sum(slot_of_row))


def v_commit(s):
    cand, n_cand, take = eligibility(s)
    fr = s.features
    want = cand & take[jnp.clip(fr.ref, 0, NG - 1)] & (fr.ref >= 0)
    slot_of_row, got = pl._rank_assign(
        s.f2row < 0, want, pl._admission_score(fr))
    return pl._commit_feature_admissions(cfg, s, slot_of_row, got)


def v_zero(s):
    mask = jnp.zeros((F,), bool).at[0].set(s.vision_counter > 0)
    keep = pl._feature_keep_vector(cfg, mask, s.P.dtype) > 0
    return s._replace(P=zero_state_entries(s.P, keep))


def v_addblocks(s):
    mask = jnp.zeros((F,), bool).at[:3].set(s.vision_counter > 0)
    rows = jnp.arange(F, dtype=jnp.int32)
    return s._replace(P=pl._add_feature_blocks(cfg, s.P, s.features, mask,
                                               rows))


timeit("eligibility (cand+rank)", v_elig)
timeit("+ group slot rank_assign", v_gslot)
timeit("+ P congruence gather", v_pcong)
timeit("elig + feature rank_assign", v_featrank)
timeit("elig + feat rank + commit", v_commit)
timeit("zero_state_entries alone", v_zero)
timeit("add_feature_blocks alone", v_addblocks)
timeit("admit_groups (real)", lambda s: pl._admit_groups(cfg, s))
timeit("admit_within (real)",
       lambda s: pl._admit_features_within_groups(cfg, s))
