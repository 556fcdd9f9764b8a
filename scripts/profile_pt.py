"""Subphase timing of _process_tracks + admission (scratch profiler)."""
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

from xivo_tpu import cam as cam_mod
from xivo_tpu.filter import pipeline as pl
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.features import subfilter_update, triangulate_two_view
from xivo_tpu.filter.state import (FS_INITIALIZING, FS_READY, TS_DROPPED,
                                   TS_TRACKED)
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))
REPS = 30

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


def timeit(name, fn):
    def body2(ss, _):
        return jax.vmap(fn)(ss), None

    @jax.jit
    def loop(ss):
        out, _ = jax.lax.scan(body2, ss, None, length=REPS)
        return out

    out = loop(s)
    jax.block_until_ready(out.P)
    t0 = time.perf_counter()
    out = loop(s)
    jax.block_until_ready(out.P)
    wall = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:38s} {wall:8.3f} ms/frame-batch")
    return wall


kind = cam_mod.MODEL_IDS[cfg.cam_model]
NG = cfg.dims.ng_rows
NF = cfg.dims.nf_rows


def ph_lifetime_and_remove(s):
    fr, gr = s.features, s.groups
    active = fr.active
    instate = fr.sind >= 0
    dropped = active & (fr.track == TS_DROPPED)
    fr = fr._replace(lifetime=jnp.where(active, fr.lifetime + 1, fr.lifetime))
    s = s._replace(features=fr)
    inst_drop = dropped & instate
    s = pl._remove_features_from_state(cfg, s, inst_drop)
    s = s._replace(features=pl._clear_feature_rows(s.features, dropped))
    return s


def ph_ref_gather(s):
    fr, gr = s.features, s.groups
    grow = jnp.clip(fr.ref, 0, NG - 1)
    Rsbr = gr.Rsb[grow]
    Tsbr = gr.Tsb[grow]
    first_xp = fr.adj_xp[jnp.arange(NF), grow]
    return s._replace(P=s.P + 0.0 * (jnp.sum(Rsbr) + jnp.sum(Tsbr)
                                     + jnp.sum(first_xp)))


def ph_triangulate(s):
    fr, gr = s.features, s.groups
    grow = jnp.clip(fr.ref, 0, NG - 1)
    Rsbr = gr.Rsb[grow]
    Tsbr = gr.Tsb[grow]
    first_xp = fr.adj_xp[jnp.arange(NF), grow]

    def tri_one(Rr, Tr, xp1, xp2, x):
        xc1 = cam_mod.unproject(kind, s.cam, xp1)
        xc2 = cam_mod.unproject(kind, s.cam, xp2)
        R1 = Rr @ s.X.Rbc
        T1 = Rr @ s.X.Tbc + Tr
        R2 = s.X.Rsb @ s.X.Rbc
        T2 = s.X.Rsb @ s.X.Tbc + s.X.Tsb
        g12R = R1.T @ R2
        g12T = R1.T @ (T2 - T1)
        Xc1 = triangulate_two_view(g12R, g12T, xc1, xc2,
                                   cfg.triangulation.method)
        return Xc1

    X = jax.vmap(tri_one)(Rsbr, Tsbr, first_xp, fr.xp, fr.x)
    return s._replace(P=s.P + 0.0 * jnp.sum(X))


def ph_subfilter(s):
    fr, gr = s.features, s.groups
    grow = jnp.clip(fr.ref, 0, NG - 1)
    Rsbr = gr.Rsb[grow]
    Tsbr = gr.Tsb[grow]
    x_new, P_new, out_inc, bad = jax.vmap(
        subfilter_update, in_axes=(None, None, None, 0, 0, 0, 0, 0,
                                   None, None))(
        kind, s.cam, s.X, Rsbr, Tsbr, fr.x, fr.Psub, fr.xp,
        cfg.subfilter.Rtri, cfg.subfilter.MH_thresh)
    return s._replace(P=s.P + 0.0 * (jnp.sum(x_new) + jnp.sum(P_new)))


def ph_admit_groups(s):
    return pl._admit_groups(cfg, s)[0]


def ph_admit_feats(s):
    return pl._admit_features_within_groups(cfg, s)[0]


timeit("lifetime + remove + clear", ph_lifetime_and_remove)
timeit("ref gathers only", ph_ref_gather)
timeit("gathers + triangulation", ph_triangulate)
timeit("gathers + subfilter", ph_subfilter)
timeit("admit_groups", ph_admit_groups)
timeit("admit_features_within_groups", ph_admit_feats)
