"""Per-phase TPU timing of the frame pipeline (batch mode).

Loads the filter for a few seconds of sim, then times each pipeline
phase in isolation (scanned N times to amortize dispatch) at the bench
batch size. Run: python scripts/profile_phases.py  (TPU; set
XIVO_PLATFORM=cpu to run on CPU).
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

from xivo_tpu.filter import pipeline as pl
from xivo_tpu.filter.config import config_from_json
from xivo_tpu.filter.update import (build_stacked_jacobian, joseph_update,
                                    mh_distances, mh_gate)
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "64"))
REPS = 100

cfg = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                       propagation_mode="fast")
fi, gt = build_pcw_stream(cfg, total_time=4.0, noise_px=0.25)

# load the filter: run the real batch runner over the stream
s0 = batch_states(cfg, B)
dt = np.dtype(cfg.dtype)
s0 = s0._replace(
    last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt), (B, 3)).copy(),
    last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt), (B, 3)).copy())
fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
run = make_batch_runner(cfg)
s, outs = run(s0, fib)
jax.block_until_ready(s.P)
print("loaded filter: instate features =",
      int(outs.num_instate_features[0, -1]))

# one frame's inputs (mid-stream), broadcast over B
T = fi.frame_dt.shape[0]
k = T - 1
inp = jax.tree.map(lambda x: jnp.broadcast_to(x[k], (B,) + x[k].shape),
                   fi)


@jax.jit
def _rtt_probe(x):
    return jnp.sum(x[0, :2])


_RTT = None


def _measure_rtt():
    global _RTT
    z = jnp.ones((8, 8), jnp.float32)
    float(_rtt_probe(z))
    t0 = time.perf_counter()
    for _ in range(5):
        float(_rtt_probe(z))
    _RTT = (time.perf_counter() - t0) / 5
    print(f"relay RTT ~ {_RTT * 1e3:.2f} ms (subtracted)")


def timeit(name, fn, *args):
    """fn(s, *args) -> s'; scan REPS iters in ONE dispatch, sync by
    fetching a scalar (block_until_ready does not truly block through
    the axon relay), subtract measured dispatch RTT."""
    if _RTT is None:
        _measure_rtt()

    def body2(ss, _):
        out = jax.vmap(fn)(ss, *args)
        return out, None

    @jax.jit
    def loop(ss):
        out, _ = jax.lax.scan(body2, ss, None, length=REPS)
        return sum(jnp.sum(l[:1].astype(jnp.float32))
                   for l in jax.tree.leaves(out))

    float(loop(s))          # compile + warm
    t0 = time.perf_counter()
    float(loop(s))
    wall = (time.perf_counter() - t0 - _RTT) / REPS * 1e3
    print(f"{name:34s} {wall:8.3f} ms/frame-batch"
          f"  ({wall / B * 1e3:7.2f} us/stream)")
    return wall


def phase_propagate(s, gy, ac, idt, fdt):
    return pl._propagate_frame_fast(cfg, s, gy, ac, idt, fdt)


def phase_tracker(s, mid, mxp, mdep, mval):
    return pl.tracker_pointcloud(cfg, s, mid, mxp, mdep, mval)


def phase_process_tracks(s):
    s, _, _ = pl._process_tracks(cfg, s)
    return s


def phase_admit(s):
    s = pl._admit_groups(cfg, s)[0]
    return pl._admit_features_within_groups(cfg, s)[0]


def phase_jacobian(s):
    sj = build_stacked_jacobian(cfg, s)
    return s._replace(P=s.P + 0.0 * (sj.H[0, 0] + sj.inn[0]))


def phase_mh(s):
    sj = build_stacked_jacobian(cfg, s)
    dist = mh_distances(s.P, sj.H, sj.inn, cfg.R)
    inl = mh_gate(cfg, dist, sj.valid)
    return s._replace(P=s.P + 0.0 * jnp.sum(inl))


def phase_joseph(s):
    sj = build_stacked_jacobian(cfg, s)
    diagR = jnp.full((2 * cfg.dims.n_features,), cfg.R, s.P.dtype)
    err, P = joseph_update(s.P, sj.H, sj.inn, diagR, sj.valid)
    return s._replace(P=P)


def phase_hygiene(s):
    NG = cfg.dims.ng_rows
    affected = jnp.zeros((NG,), bool)
    s, _ = pl._discard_affected_groups(cfg, s, affected)
    return pl._refresh_gauge_features(cfg, s)


def phase_post(s):
    s = pl._create_group_and_init_tracks(cfg, s)
    s = pl._adapt_initial_depth(cfg, s)
    s = pl._enforce_max_group_lifetime(cfg, s)
    return pl._switch_gauge_group(cfg, s)


def phase_reject(s):
    # the MH-reject bookkeeping block of update_step (not isolated before)
    sj = build_stacked_jacobian(cfg, s)
    rejected_slots = sj.valid & (mh_distances(s.P, sj.H, sj.inn, cfg.R)
                                 > cfg.MH_thresh)
    rej_rows_idx = jnp.where(rejected_slots, s.f2row, -1)
    rej_rows = jnp.any(
        (rej_rows_idx >= 0)[:, None]
        & (rej_rows_idx[:, None] == jnp.arange(cfg.dims.nf_rows)[None, :]),
        axis=0)
    s = pl._remove_features_from_state(cfg, s, rej_rows)
    return s._replace(features=pl._clear_feature_rows(s.features, rej_rows))


def phase_absorb(s):
    from xivo_tpu.filter.update import absorb_error
    err = 1e-7 * jnp.arange(cfg.dims.full, dtype=s.P.dtype)
    return absorb_error(cfg, s, err)


def phase_cond_rebuild(s):
    sj = build_stacked_jacobian(cfg, s)
    sj2 = jax.lax.cond(s.vision_counter % 2 == 0,
                       lambda s: build_stacked_jacobian(cfg, s),
                       lambda s: sj, s)
    return s._replace(P=s.P + 0.0 * (sj2.H[0, 0] + sj2.inn[0]))


def phase_pred_bookkeeping(s):
    sj2 = build_stacked_jacobian(cfg, s)
    fr = s.features
    tgt_rows = jnp.where(sj2.valid, s.f2row, cfg.dims.nf_rows)
    oh_pred = (tgt_rows[:, None] == jnp.arange(cfg.dims.nf_rows)[None, :])
    hit_pred = jnp.any(oh_pred, axis=0)
    new_pred = jnp.einsum("sf,sk->fk", oh_pred.astype(fr.pred.dtype),
                          sj2.pred.astype(fr.pred.dtype))
    fr = fr._replace(pred=jnp.where(hit_pred[:, None], new_pred, fr.pred))
    return s._replace(features=fr)


def phase_update_step(s):
    s, _ = pl.update_step(cfg, s)
    return s


def phase_full_frame(s, gy, ac, idt, fdt, mid, mxp, mdep, mval):
    s, _ = pl.vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep, mval)
    return s


total = 0.0
total += timeit("propagate (fast)", phase_propagate, inp.gyro, inp.accel,
                inp.imu_dt, inp.frame_dt)
total += timeit("tracker (pointcloud)", phase_tracker, inp.meas_id,
                inp.meas_xp, inp.meas_depth, inp.meas_valid)
total += timeit("process_tracks", phase_process_tracks)
total += timeit("admission", phase_admit)
total += timeit("jacobian build", phase_jacobian)
total += timeit("jacobian + MH gate", phase_mh)
total += timeit("jacobian + joseph", phase_joseph)
total += timeit("hygiene (discard+gauge)", phase_hygiene)
total += timeit("post (group create, depth...)", phase_post)
total += timeit("reject bookkeeping (jac incl)", phase_reject)
total += timeit("absorb_error", phase_absorb)
total += timeit("cond jac rebuild (jac incl)", phase_cond_rebuild)
total += timeit("pred bookkeeping (jac incl)", phase_pred_bookkeeping)
print(f"{'sum of isolated phases':34s} {total:8.3f} (double-counts jac)")
timeit("update_step (whole)", phase_update_step)
timeit("vio_frame (whole)", phase_full_frame, inp.gyro, inp.accel,
       inp.imu_dt, inp.frame_dt, inp.meas_id, inp.meas_xp, inp.meas_depth,
       inp.meas_valid)
