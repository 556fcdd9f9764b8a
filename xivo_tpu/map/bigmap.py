"""Map-scale mapping: observation retention + BA-over-the-map.

Extends the ring-buffer map (map/mapper.py) with what the reference's
Mapper keeps but our fast path drops: the observation history. Each
retired landmark stores up to O normalized-plane observations with the
camera (keyframe) poses they were made from, so the map can be REFINED
offline/periodically by bundle adjustment — the reference wires g2o
vertices on retirement (src/optimizer_adapters.cpp:10-54) but never
triggers Solve (src/optimizer.h:2-3 "run in background" is dead code);
here `refine_map` is a real job, single-device or landmark-sharded over
a mesh via the distributed Schur solver (dist/ba.py).

Capacity note: keyframe slots are a ring like landmarks; size Kc so a
keyframe outlives every landmark that references it (Kc >= map
turnover per trajectory segment), or refine before reuse.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..ba.core import BAProblem, solve as ba_solve
from ..filter.config import VIOConfig
from ..filter.features import unproject_logz
from ..filter.state import VIOState
from ..ops.dense import HIGHEST
from ..geom import so3


class BigMapState(NamedTuple):
    # landmark tables — the shard axis for multi-chip maps
    Xs: jnp.ndarray        # (M,3)
    desc: jnp.ndarray      # (M,8) uint32
    valid: jnp.ndarray     # (M,)
    obs_xn: jnp.ndarray    # (M,O,2) normalized-plane observations
    obs_kf: jnp.ndarray    # (M,O) int32 keyframe slot, -1 invalid
    epoch: jnp.ndarray     # (M,) int32 vision_counter at insertion
    write_ptr: jnp.ndarray
    count: jnp.ndarray
    # keyframe ring (replicated; camera-to-world poses)
    kf_R: jnp.ndarray      # (Kc,3,3)
    kf_T: jnp.ndarray      # (Kc,3)
    kf_valid: jnp.ndarray  # (Kc,)
    kf_ptr: jnp.ndarray
    # group-table row -> keyframe slot mapping, validated by gid
    kf_of_grow: jnp.ndarray  # (NGR,) int32
    kf_gid: jnp.ndarray      # (NGR,) int32 gid the mapping was made for


def init_bigmap(cfg: VIOConfig, capacity: int = 4096, obs_cap: int = 8,
                kf_capacity: int = 256, dtype=jnp.float32) -> BigMapState:
    NGR = cfg.dims.ng_rows
    return BigMapState(
        Xs=jnp.zeros((capacity, 3), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        valid=jnp.zeros((capacity,), bool),
        obs_xn=jnp.zeros((capacity, obs_cap, 2), dtype),
        obs_kf=jnp.full((capacity, obs_cap), -1, jnp.int32),
        epoch=jnp.zeros((capacity,), jnp.int32),
        write_ptr=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
        kf_R=jnp.tile(jnp.eye(3, dtype=dtype), (kf_capacity, 1, 1)),
        kf_T=jnp.zeros((kf_capacity, 3), dtype),
        kf_valid=jnp.zeros((kf_capacity,), bool),
        kf_ptr=jnp.asarray(0, jnp.int32),
        kf_of_grow=jnp.full((NGR,), -1, jnp.int32),
        kf_gid=jnp.full((NGR,), -1, jnp.int32))


def retire_features_obs(cfg: VIOConfig, s: VIOState, bm: BigMapState,
                        row_mask) -> BigMapState:
    """Retire features WITH their observation history.

    1. allocate keyframe slots for every group the retiring features
       observed (dedup'd by the gid-validated row mapping);
    2. per feature, collect up to O (keyframe, normalized-obs) pairs
       from the adjacency;
    3. ring-insert landmarks + observation rows.
    """
    fr, gr = s.features, s.groups
    NGR = gr.gid.shape[0]
    NF = fr.fid.shape[0]
    O = bm.obs_kf.shape[1]
    Kc = bm.kf_R.shape[0]
    M = bm.Xs.shape[0]
    dtype = bm.Xs.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    retire = row_mask & fr.active & (fr.ref >= 0)

    # --- 1. keyframes
    mapping_ok = (bm.kf_of_grow >= 0) & (bm.kf_gid == gr.gid)
    obs_groups = jnp.any(fr.adj & retire[:, None], axis=0) & gr.active
    need = obs_groups & ~mapping_ok
    rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    new_slot = (bm.kf_ptr + rank) % Kc
    tgt = jnp.where(need, new_slot, Kc)
    Rsc = jnp.einsum("gij,jk->gik", gr.Rsb, s.X.Rbc).astype(dtype)
    Tsc = (jnp.einsum("gij,j->gi", gr.Rsb, s.X.Tbc)
           + gr.Tsb).astype(dtype)
    kf_R = bm.kf_R.at[tgt].set(Rsc)
    kf_T = bm.kf_T.at[tgt].set(Tsc)
    kf_valid = bm.kf_valid.at[tgt].set(True)
    kf_of_grow = jnp.where(need, new_slot,
                           jnp.where(mapping_ok, bm.kf_of_grow, -1))
    kf_gid = jnp.where(need | mapping_ok, gr.gid, -1)
    kf_ptr = (bm.kf_ptr + jnp.sum(need.astype(jnp.int32))) % Kc

    # --- 2. per-feature observation rows (first O observed groups)
    def collect(f):
        a = fr.adj[f]
        order = jnp.argsort(~a)[:O]              # observed group rows first
        got = a[order] & (kf_of_grow[order] >= 0)
        # explicit cast: argsort indices are int64 under x64 and the
        # promotion would poison the int32 obs_kf scatter
        kf = jnp.where(got, kf_of_grow[order], -1).astype(jnp.int32)
        xp = fr.adj_xp[f, order]
        xn = jax.vmap(lambda p: cam_mod.unproject(kind, s.cam, p))(xp)
        return xn.astype(dtype), kf

    obs_xn, obs_kf = jax.vmap(collect)(jnp.arange(NF))

    # --- 3. landmark positions + ring insert
    grow = jnp.clip(fr.ref, 0, NGR - 1)

    def xs_of(f):
        Xc, _ = unproject_logz(fr.x[f])
        R = gr.Rsb[grow[f]]
        T = gr.Tsb[grow[f]]
        return R @ (s.X.Rbc @ Xc + s.X.Tbc) + T

    Xs = jax.vmap(xs_of)(jnp.arange(NF)).astype(dtype)
    lrank = jnp.cumsum(retire.astype(jnp.int32)) - 1
    ltgt = jnp.where(retire, (bm.write_ptr + lrank) % M, M)
    return bm._replace(
        Xs=bm.Xs.at[ltgt].set(Xs),
        desc=bm.desc.at[ltgt].set(fr.desc),
        valid=bm.valid.at[ltgt].set(True),
        obs_xn=bm.obs_xn.at[ltgt].set(obs_xn),
        obs_kf=bm.obs_kf.at[ltgt].set(obs_kf),
        epoch=bm.epoch.at[ltgt].set(s.vision_counter.astype(jnp.int32)),
        write_ptr=(bm.write_ptr + jnp.sum(retire.astype(jnp.int32))) % M,
        count=bm.count + jnp.sum(retire.astype(jnp.int32)),
        kf_R=kf_R, kf_T=kf_T, kf_valid=kf_valid, kf_ptr=kf_ptr,
        kf_of_grow=kf_of_grow, kf_gid=kf_gid)


def map_ba_problem(bm: BigMapState, min_obs: int = 2) -> BAProblem:
    """Assemble the BA problem from the map tables.

    Dense (M, Kc) mask/obs — the layout the Schur solver wants; for a
    sharded map each device expands only its M/n landmark slice (the
    landmark axis is the shard axis of dist/ba.py's solver). Gauge:
    the two oldest valid keyframes are fixed (pins SE(3) + scale).
    """
    M, O = bm.obs_kf.shape
    Kc = bm.kf_R.shape[0]
    dtype = bm.Xs.dtype
    oh = (bm.obs_kf[:, :, None] ==
          jnp.arange(Kc)[None, None, :])           # (M, O, Kc)
    mask = jnp.any(oh, axis=1)                      # (M, Kc)
    obs = jnp.einsum("lok,loc->lkc", oh.astype(dtype), bm.obs_xn,
                     precision=HIGHEST)
    n_obs = jnp.sum(mask, axis=1)
    lm_ok = bm.valid & (n_obs >= min_obs)
    mask = mask & lm_ok[:, None] & bm.kf_valid[None, :]

    idx = jnp.arange(Kc)
    order = jnp.argsort(jnp.where(bm.kf_valid, idx, Kc))
    fixed = jnp.zeros((Kc,), bool).at[order[:2]].set(True) & bm.kf_valid
    return BAProblem(Rs=bm.kf_R, Ts=bm.kf_T, Xs=bm.Xs, obs=obs,
                     mask=mask, fixed=fixed)


def refine_map(cfg: VIOConfig, bm: BigMapState, iters: int = 10,
               damping: float = 1e-4, huber_thresh: float = 0.01,
               mesh=None, min_obs: int = 2
               ) -> Tuple[BigMapState, jnp.ndarray]:
    """BA refinement job over the retained map.

    Returns (refined map, chi2 history). With `mesh`, landmarks shard
    across devices and the reduced camera system is psum'd
    (dist/ba.py) — the map-scale path for maps beyond one chip.
    """
    p = map_ba_problem(bm, min_obs=min_obs)
    if mesh is not None:
        from ..dist.ba import make_distributed_solver, shard_problem
        solver = make_distributed_solver(mesh, iters=iters,
                                         damping=damping,
                                         huber_thresh=huber_thresh)
        p2, chi2 = solver(shard_problem(p, mesh))
    else:
        p2, chi2 = ba_solve(p, iters=iters, damping=damping,
                            huber_thresh=huber_thresh)
    moved = jnp.any(p.mask, axis=1)
    return bm._replace(
        Xs=jnp.where(moved[:, None], p2.Xs, bm.Xs),
        kf_R=jnp.where(bm.kf_valid[:, None, None], p2.Rs, bm.kf_R),
        kf_T=jnp.where(bm.kf_valid[:, None], p2.Ts, bm.kf_T)), chi2


def as_mapstate(bm: BigMapState):
    """View the landmark tables as a plain MapState for the loop-closure
    path (map/mapper.py works unchanged on the refined landmarks)."""
    from .mapper import MapState
    M = bm.Xs.shape[0]
    dt = bm.Xs.dtype
    return MapState(
        Xs=bm.Xs, desc=bm.desc, valid=bm.valid, epoch=bm.epoch,
        # BA-refined landmarks carry no covariance table; a small
        # isotropic prior keeps the LC R inflation well-defined
        cov=jnp.tile(0.01 * jnp.eye(3, dtype=dt), (M, 1, 1)),
        gid=jnp.full((M,), -1, jnp.int32),
        write_ptr=bm.write_ptr, count=bm.count,
        n_merged=jnp.asarray(0, jnp.int32))
