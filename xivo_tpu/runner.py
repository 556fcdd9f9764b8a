"""Batched/scanned execution of the VIO pipeline.

The TPU throughput path (SURVEY.md §2.6: the reference has no
parallelism; here multi-sequence batch VIO is the data-parallel axis):

* ``run_sequence`` — ``lax.scan`` of the frame pipeline over a whole
  pre-packed measurement stream: one compiled program for the entire
  trajectory, zero per-frame dispatch.
* ``run_batch`` — ``vmap`` of that scan over B independent sequences:
  every small matrix op in the filter becomes a batched op that tiles
  onto the MXU.
* ``run_sharded`` — the batch axis laid out over a device mesh with
  ``shard_map``; each chip runs its shard of sequences. Scaling is
  embarrassingly parallel (no collectives needed in the filter itself);
  collectives enter later in the distributed BA/retrieval backend.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .filter.config import VIOConfig
from .filter.pipeline import StepOutputs, vio_frame
from .filter.state import VIOState, init_state


class FrameInputs(NamedTuple):
    """Per-frame packed inputs; arrays lead with the frame axis T."""
    gyro: jnp.ndarray       # (T, KI, 3)
    accel: jnp.ndarray      # (T, KI, 3)
    imu_dt: jnp.ndarray     # (T, KI)
    frame_dt: jnp.ndarray   # (T,)
    meas_id: jnp.ndarray    # (T, M) int32, -1 invalid
    meas_xp: jnp.ndarray    # (T, M, 2)
    meas_depth: jnp.ndarray  # (T, M)
    meas_valid: jnp.ndarray  # (T, M) bool


def pack_frame_inputs(frames, imu_cap=32, meas_cap=256, dtype=np.float32):
    """Host-side packing of a measurement stream.

    ``frames`` is a list of dicts with keys: imu (list of (dt, gyro,
    accel)), frame_dt, ids (N,), xp (N,2), depth (N,).

    ``imu_cap`` is an upper bound; the packed arrays are trimmed to the
    actual max samples/frame — the propagation scan runs per packed row,
    so padding rows are pure waste on device.
    """
    T = len(frames)
    need = max((len(f["imu"]) for f in frames), default=1)
    imu_cap = max(1, min(imu_cap, need))
    gyro = np.zeros((T, imu_cap, 3), dtype)
    accel = np.zeros((T, imu_cap, 3), dtype)
    imu_dt = np.zeros((T, imu_cap), dtype)
    frame_dt = np.zeros((T,), dtype)
    meas_id = np.full((T, meas_cap), -1, np.int32)
    meas_xp = np.zeros((T, meas_cap, 2), dtype)
    meas_depth = np.full((T, meas_cap), -1.0, dtype)
    meas_valid = np.zeros((T, meas_cap), bool)
    for t, f in enumerate(frames):
        for i, (dt, gy, ac) in enumerate(f["imu"][:imu_cap]):
            imu_dt[t, i] = dt
            gyro[t, i] = gy
            accel[t, i] = ac
        frame_dt[t] = f["frame_dt"]
        n = min(len(f["ids"]), meas_cap)
        meas_id[t, :n] = f["ids"][:n]
        meas_xp[t, :n] = f["xp"][:n]
        meas_depth[t, :n] = f["depth"][:n]
        meas_valid[t, :n] = True
    return FrameInputs(*(jnp.asarray(a) for a in
                         (gyro, accel, imu_dt, frame_dt, meas_id, meas_xp,
                          meas_depth, meas_valid)))


def make_sequence_runner(cfg: VIOConfig):
    """Returns jitted (state, FrameInputs) -> (state, StepOutputs-stacked)."""

    def step(s: VIOState, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        s, out = vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep, mval)
        return s, out

    @partial(jax.jit, donate_argnums=(0,))
    def run(s: VIOState, fi: FrameInputs):
        return jax.lax.scan(step, s, tuple(fi))

    return run


def make_batch_runner(cfg: VIOConfig):
    """vmap of the sequence scan over a leading batch axis."""

    def step(s, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        return vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep, mval)

    def one(s, fi: FrameInputs):
        return jax.lax.scan(step, s, tuple(fi))

    @partial(jax.jit, donate_argnums=(0,))
    def run(states, fis):
        return jax.vmap(one)(states, fis)

    return run


def make_sharded_runner(cfg: VIOConfig, mesh: jax.sharding.Mesh,
                        axis: str = "data"):
    """Batch runner with the batch axis sharded over a device mesh.

    Multi-sequence VIO is data-parallel: each device owns B/n sequences;
    no cross-device communication inside the filter. Uses shard_map so
    the per-device program is exactly the single-chip scan (no XLA
    partitioner surprises in the scan body).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def step(s, inp):
        gy, ac, idt, fdt, mid, mxp, mdep, mval = inp
        return vio_frame(cfg, s, gy, ac, idt, fdt, mid, mxp, mdep, mval)

    def one(s, fi):
        return jax.lax.scan(step, s, tuple(fi))

    def local(states, fis):
        return jax.vmap(one)(states, fis)

    # batch-leading PartitionSpec for every leaf
    def specs_for(tree):
        return jax.tree.map(lambda _: P(axis), tree)

    @jax.jit
    def run(states, fis):
        sm = shard_map(local, mesh=mesh,
                       in_specs=(specs_for(states), specs_for(fis)),
                       out_specs=(specs_for(states),
                                  jax.tree.map(lambda _: P(axis),
                                               _out_struct(cfg))),
                       check_vma=False)
        return sm(states, fis)

    return run


def _out_struct(cfg):
    """A StepOutputs-shaped pytree skeleton for out_specs."""
    z = 0
    return StepOutputs(Rsb=z, Tsb=z, Vsb=z, num_instate_features=z,
                       num_instate_groups=z, num_tracked=z,
                       num_mh_rejected=z, num_oneptransac_rejected=z,
                       num_tracker_outlier_rejected=z, inn_rms=z,
                       num_oos_dropped=z)


def batch_states(cfg: VIOConfig, B: int) -> VIOState:
    """B replicated initial states (leading batch axis)."""
    s = init_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(
        x, (B,) + x.shape).copy(), s)
