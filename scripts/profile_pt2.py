"""Reliable ablation timing of process_tracks internals (scratch).

Methodology: scan REPS iters in one dispatch, scalar-fetch sync over all
leaves, subtract relay RTT (block_until_ready does not block through
the axon relay).
"""
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
from xivo_tpu.filter.state import FS_INITIALIZING, FS_READY, TS_DROPPED, \
    TS_TRACKED
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))
REPS = 100

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
print("loaded; instate =", int(outs.num_instate_features[0, -1]))


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


kind = cam_mod.MODEL_IDS[cfg.cam_model]
NG = cfg.dims.ng_rows
NF = cfg.dims.nf_rows


def pt_variant(do_remove=True, do_tri=True, do_sub=True):
    def fn(s):
        fr, gr = s.features, s.groups
        active = fr.active
        instate = fr.sind >= 0
        dropped = active & (fr.track == TS_DROPPED)
        fr = fr._replace(lifetime=jnp.where(active, fr.lifetime + 1,
                                            fr.lifetime))
        s = s._replace(features=fr)
        if do_remove:
            inst_drop = dropped & instate
            s = pl._remove_features_from_state(cfg, s, inst_drop)
            s = s._replace(
                features=pl._clear_feature_rows(s.features, dropped))
        fr = s.features
        sub = fr.active & (fr.track == TS_TRACKED) & (fr.sind < 0) \
            & ((fr.status == FS_INITIALIZING) | (fr.status == FS_READY))
        grow = jnp.clip(fr.ref, 0, NG - 1)
        Rsbr = gr.Rsb[grow]
        Tsbr = gr.Tsb[grow]
        if do_tri:
            first_xp = fr.adj_xp[jnp.arange(NF), grow]
            n_tri = sub & (fr.init_counter == 0)

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
                z = Xc1[2]
                ok = (z > cfg.triangulation.zmin) \
                    & (z < cfg.triangulation.zmax)
                zs = jnp.where(ok, z, 1.0)
                xn = jnp.stack([Xc1[0] / zs, Xc1[1] / zs, jnp.log(zs)])
                return jnp.where(ok, xn, x), ok

            x_tri, tri_ok = jax.vmap(tri_one)(Rsbr, Tsbr, first_xp,
                                              fr.xp, fr.x)
            fr = fr._replace(
                x=jnp.where((n_tri & tri_ok)[:, None], x_tri, fr.x),
                tri_ok=jnp.where(n_tri, tri_ok, fr.tri_ok))
        if do_sub:
            x_new, P_new, out_inc, bad = jax.vmap(
                subfilter_update, in_axes=(None, None, None, 0, 0, 0, 0, 0,
                                           None, None))(
                kind, s.cam, s.X, Rsbr, Tsbr, fr.x, fr.Psub, fr.xp,
                cfg.subfilter.Rtri, cfg.subfilter.MH_thresh)
            init_c = jnp.where(sub, fr.init_counter + 1, fr.init_counter)
            ready = init_c > cfg.subfilter.ready_steps
            fr = fr._replace(
                x=jnp.where(sub[:, None], x_new, fr.x),
                Psub=jnp.where(sub[:, None, None], P_new, fr.Psub),
                outlier_counter=jnp.where(
                    sub, jnp.where(bad, fr.outlier_counter + out_inc, 0.0),
                    fr.outlier_counter),
                init_counter=init_c,
                status=jnp.where(sub, jnp.where(ready, FS_READY,
                                                FS_INITIALIZING),
                                 fr.status))
            evict = sub & (fr.outlier_counter > cfg.remove_outlier_counter)
            fr = pl._clear_feature_rows(fr, evict)
        return s._replace(features=fr)
    return fn


timeit("pt full", pt_variant())
timeit("pt w/o subfilter", pt_variant(do_sub=False))
timeit("pt w/o triangulation", pt_variant(do_tri=False))
timeit("pt w/o remove", pt_variant(do_remove=False))
timeit("pt only lifetime", pt_variant(False, False, False))
timeit("pt real (impl)", lambda s: pl._process_tracks(cfg, s)[0])
