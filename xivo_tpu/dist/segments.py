"""Segment-parallel processing of long trajectories.

The VIO filter is inherently sequential in time; the TPU-native way to
scale a LONG trajectory is to split it into S overlapping segments,
cold-start each one with the closed-form visual-inertial initializer
(filter/vi_init.py — the reference cannot cold-start mid-motion at
all), run all segments as one vmapped/sharded batch, and fuse the
overlaps with a gravity-aligned 4-DoF alignment. This is the VIO
analogue of sequence parallelism (SURVEY.md §2.6): wall-clock scales
with segment length, not trajectory length, at the cost of S-way
parallel hardware and the overlap redundancy.

Segment frames and gauges are independent (each segment's spatial
frame has its own origin and yaw — exactly the 4 unobservable DoF of
monocular VIO), which is why the fusion transform is yaw+translation,
not full SE(3).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..filter.config import VIOConfig
from ..filter.state import VIOState, init_state
from ..filter.vi_init import vi_bootstrap
from ..runner import FrameInputs, make_batch_runner


class SegmentPlan(NamedTuple):
    starts: np.ndarray      # (S,) segment start frames
    seg_len: int            # frames per segment INCLUDING overlap
    core_len: int           # frames each segment contributes
    overlap: int


def plan_segments(T: int, n_segments: int, overlap: int) -> SegmentPlan:
    core = math.ceil(T / n_segments)
    starts = np.arange(n_segments) * core
    seg_len = core + overlap
    return SegmentPlan(starts=starts, seg_len=seg_len, core_len=core,
                       overlap=overlap)


def split_stream(fi: FrameInputs, plan: SegmentPlan) -> FrameInputs:
    """Stack S overlapping segment views of a packed stream: (S, L, ...).

    Segment k>0's first packed IMU row belongs to the PREVIOUS frame
    interval (runner.pack_frame_inputs convention), so it is zeroed —
    the seeded state is defined AT the segment's first frame time.
    """
    T = fi.frame_dt.shape[0]
    L = plan.seg_len

    def seg(x):
        pads = [(0, plan.starts[-1] + L - T)] + [(0, 0)] * (x.ndim - 1)
        xp = np.pad(np.asarray(x), pads)
        return np.stack([xp[s:s + L] for s in plan.starts])

    out = FrameInputs(*[seg(x) for x in fi])
    imu_dt = np.asarray(out.imu_dt).copy()
    frame_dt = np.asarray(out.frame_dt).copy()
    imu_dt[1:, 0, :] = 0.0
    frame_dt[1:, 0] = 0.0
    return out._replace(imu_dt=imu_dt, frame_dt=frame_dt)


def seed_segment_states(cfg: VIOConfig, fis: FrameInputs, boot_frames: int,
                        v_std: float = 0.5, att_std: float = 0.1
                        ) -> VIOState:
    """Batched segment cold-start: closed-form VI init per segment.

    Returns (S,)-batched VIOState with gravity-aligned attitude and the
    bootstrapped velocity, and priors opened up to the initializer's
    expected error (v_std, att_std roll/pitch; yaw is gauge).
    """
    S = fis.frame_dt.shape[0]
    s0 = init_state(cfg)
    dt = s0.P.dtype

    use_depths = bool(getattr(cfg, "sim_initialize_depths", False))

    def one(gyro, accel, imu_dt, frame_dt, mid, mxp, mval, mdep):
        w = slice(0, boot_frames)
        return vi_bootstrap(cfg, s0.cam, gyro[w], accel[w], imu_dt[w],
                            frame_dt[w], mid[w], mxp[w], mval[w],
                            meas_depth=mdep[w] if use_depths else None)

    boot = jax.jit(jax.vmap(one))(
        jnp.asarray(fis.gyro, dt), jnp.asarray(fis.accel, dt),
        jnp.asarray(fis.imu_dt, dt), jnp.asarray(fis.frame_dt, dt),
        jnp.asarray(fis.meas_id), jnp.asarray(fis.meas_xp, dt),
        jnp.asarray(fis.meas_valid), jnp.asarray(fis.meas_depth, dt))

    sb = jax.tree.map(lambda x: jnp.broadcast_to(
        x, (S,) + x.shape).copy(), s0)
    # first IMU sample of the segment seeds the held signal values
    lg = jnp.asarray(fis.gyro[:, 1, 0, :], dt)
    la = jnp.asarray(fis.accel[:, 1, 0, :], dt)
    X = sb.X._replace(Rsb=boot.Rsb0, Vsb=boot.Vsb0)
    # widen the seeded-state priors: the closed-form init is not exact
    from ..filter import layout as L
    D = cfg.dims.full
    diag_extra = jnp.zeros((D,), dt)
    diag_extra = diag_extra.at[L.WSB:L.WSB + 3].set(att_std ** 2)
    diag_extra = diag_extra.at[L.VSB:L.VSB + 3].set(v_std ** 2)
    if cfg.covariance_form == "sqrt":
        # fresh init factor is diagonal: widen in std space
        idx = jnp.arange(D)
        diag0 = sb.P[:, idx, idx]
        P = sb.P.at[:, idx, idx].set(jnp.sqrt(diag0 ** 2
                                              + diag_extra[None, :]))
    else:
        P = sb.P + jnp.diag(diag_extra)[None, :, :]
    return sb._replace(X=X, P=P, last_gyro=lg, last_accel=la)


def yaw_translation_align(p_ref: np.ndarray, p_src: np.ndarray):
    """4-DoF alignment: Rz(theta) @ p_src + t ~= p_ref (least squares).

    The relative gauge between two segments of a gravity-aligned
    monocular VIO is exactly yaw + translation.
    """
    mr = p_ref.mean(axis=0)
    ms = p_src.mean(axis=0)
    a = p_ref - mr
    b = p_src - ms
    num = np.sum(b[:, 0] * a[:, 1] - b[:, 1] * a[:, 0])
    den = np.sum(b[:, 0] * a[:, 0] + b[:, 1] * a[:, 1])
    th = math.atan2(num, den)
    c, s = math.cos(th), math.sin(th)
    Rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    t = mr - Rz @ ms
    return Rz, t


def fuse_segments(Tsb_segs: np.ndarray, plan: SegmentPlan, T: int
                  ) -> np.ndarray:
    """Chain segments into one trajectory via overlap alignment.

    Tsb_segs: (S, L, 3) per-segment position estimates in their own
    frames. Each segment is aligned to the ALREADY-FUSED trajectory on
    its first `overlap` frames, then contributes its core region.
    """
    S, L, _ = Tsb_segs.shape
    fused = np.zeros((plan.starts[-1] + L, 3))
    fused[:L] = Tsb_segs[0]
    end = L
    for k in range(1, S):
        s0 = plan.starts[k]
        ov = min(plan.overlap, end - s0)
        p_ref = fused[s0:s0 + ov]
        p_src = np.asarray(Tsb_segs[k][:ov])
        Rz, t = yaw_translation_align(p_ref, p_src)
        aligned = (Rz @ np.asarray(Tsb_segs[k]).T).T + t
        # blend the overlap linearly, then take the rest
        w = np.linspace(0.0, 1.0, ov)[:, None]
        fused[s0:s0 + ov] = (1 - w) * fused[s0:s0 + ov] + w * aligned[:ov]
        fused[s0 + ov:s0 + L] = aligned[ov:]
        end = s0 + L
    return fused[:T]


def run_segment_parallel(cfg: VIOConfig, fi: FrameInputs, n_segments: int,
                         overlap: int = 20, boot_frames: int = 16,
                         runner=None):
    """End-to-end segment-parallel VIO over one packed stream.

    Returns (fused_Tsb (T,3), per-segment outs). `runner` defaults to
    the vmapped batch runner (one chip); pass a sharded runner to
    spread segments over a device mesh.
    """
    T = fi.frame_dt.shape[0]
    plan = plan_segments(T, n_segments, overlap)
    fis = split_stream(fi, plan)
    states = seed_segment_states(cfg, fis, boot_frames)
    run = runner if runner is not None else make_batch_runner(cfg)
    fis_dev = jax.tree.map(jnp.asarray, fis)
    _, outs = run(states, fis_dev)
    fused = fuse_segments(np.asarray(outs.Tsb), plan, T)
    return fused, outs
