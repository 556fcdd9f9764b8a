"""Sparse map + loop closure.

Re-design of the reference Mapper (src/mapper.{h,cpp}): retired features
live in a fixed-capacity device table; loop-closure candidates come from
EXACT batched Hamming matching of BRIEF descriptors (a deliberate
departure from DBoW2 — the vocabulary tree only exists to prune CPU
search; on TPU the full query x map distance matrix is a single
XOR+popcount einsum and strictly better recall); geometric verification
is the vectorized P3P RANSAC; accepted matches become EKF rows against
the current pose (CloseLoopInternal, src/update.cpp:171-210).

Sharding note (SURVEY §2.6): the map table is the natural shard axis for
multi-chip retrieval — each device scores its slice and a psum-argmin
picks global nearest neighbors. Single-chip path here; the sharded
variant lives in dist/.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cam as cam_mod
from ..filter import layout as L
from ..filter.config import VIOConfig
from ..filter.features import project_persp, unproject_logz
from ..filter.state import VIOState
from ..frontend import brief
from ..geom import so3
from .p3p import pnp_ransac


class MapState(NamedTuple):
    Xs: jnp.ndarray        # (M,3) landmark positions (spatial frame)
    desc: jnp.ndarray      # (M,8) uint32 BRIEF
    valid: jnp.ndarray     # (M,)
    write_ptr: jnp.ndarray  # () int32 ring pointer
    count: jnp.ndarray      # () int32 total inserted (diagnostic)


def init_map(capacity: int = 20000, dtype=jnp.float32) -> MapState:
    return MapState(
        Xs=jnp.zeros((capacity, 3), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        valid=jnp.zeros((capacity,), bool),
        write_ptr=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32))


def map_insert(ms: MapState, Xs, desc, valid) -> MapState:
    """Ring-buffer insert of a batch of retired landmarks.

    (Mapper::AddFeature retirement path, src/mapper.cpp:158-240; merge-
    on-retire is folded into the LC update rather than explicit fusion.)
    """
    M = ms.Xs.shape[0]
    n = valid.shape[0]
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, (ms.write_ptr + rank) % M, M)
    return ms._replace(
        Xs=ms.Xs.at[tgt].set(Xs.astype(ms.Xs.dtype)),
        desc=ms.desc.at[tgt].set(desc),
        valid=ms.valid.at[tgt].set(True),
        write_ptr=(ms.write_ptr + jnp.sum(valid.astype(jnp.int32))) % M,
        count=ms.count + jnp.sum(valid.astype(jnp.int32)))


def detect_loop_closures(cfg: VIOConfig, s: VIOState, ms: MapState,
                         nn_dist_thresh: int = 30,
                         ransac_thresh: float = 0.03,
                         min_matches: int = 5,
                         matcher=None):
    """Descriptor matching + P3P verification.

    Mirrors Mapper::DetectLoopClosures (src/mapper.cpp:335-418). Returns
    (match_rows (F,), map_idx (F,), match_ok (F,), any_loop ()).
    Queries are the current instate features.

    `matcher` (optional): a sharded NN matcher from
    dist/retrieval.make_sharded_matcher — pass it (with ms's landmark
    tables device_put with the matching landmark sharding) when the map
    exceeds one chip's HBM; the single-chip einsum is used otherwise.
    """
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    F = cfg.dims.n_features
    kind = cam_mod.MODEL_IDS[cfg.cam_model]

    def per_slot(slot):
        row = s.f2row[slot]
        ok = row >= 0
        rowc = jnp.maximum(row, 0)
        d = fr.desc[rowc]
        xp = fr.xp[rowc]
        return d, xp, ok, rowc

    qdesc, qxp, qok, qrow = jax.vmap(per_slot)(jnp.arange(F))

    if matcher is None:
        D = brief.hamming_matrix(qdesc, ms.desc)      # (F, M)
        D = jnp.where(ms.valid[None, :], D, 10_000)
        nn = jnp.argmin(D, axis=1)
        nnd = jnp.min(D, axis=1)
    else:
        nn, nnd = matcher(qdesc, ms.desc, ms.valid)
    match = qok & (nnd < nn_dist_thresh)
    n_match = jnp.sum(match.astype(jnp.int32))

    # bearings of the query pixels in the current camera frame
    def bearing(xp):
        xcn = cam_mod.unproject(kind, s.cam, xp)
        v = jnp.concatenate([xcn, jnp.ones((1,), xcn.dtype)])
        return v / jnp.linalg.norm(v)

    bear = jax.vmap(bearing)(qxp)
    Xw = ms.Xs[jnp.clip(nn, 0, ms.Xs.shape[0] - 1)].astype(bear.dtype)

    key, subkey = jax.random.split(s.key)
    R, t, inl, okr = pnp_ransac(subkey, Xw, bear, match,
                                inlier_thresh=ransac_thresh,
                                min_inliers=min_matches)
    good = (n_match >= min_matches) & okr
    inlier = match & inl & good
    # the reference discards when <= 4 geometric inliers survive
    enough = jnp.sum(inlier.astype(jnp.int32)) > 4
    inlier = inlier & enough
    return qrow, nn, inlier, jnp.any(inlier), key


def close_loop(cfg: VIOConfig, s: VIOState, ms: MapState,
               **detect_kw) -> Tuple[VIOState, jnp.ndarray]:
    """Full CloseLoop step: detect + EKF rows against the current pose.

    The reference anchors LC rows at the newest group's slot
    (src/update.cpp:171-210); the newest group's pose IS the current body
    pose, so we take the Jacobians w.r.t. (Wsb, Tsb, Wbc, Tbc) directly —
    identical measurement model, well-defined slots.
    """
    from ..filter.update import absorb_error, measurement_update

    F = cfg.dims.n_features
    D = cfg.dims.full
    dtype = s.P.dtype
    kind = cam_mod.MODEL_IDS[cfg.cam_model]
    fr = s.features

    qrow, nn, inlier, any_loop, key = detect_loop_closures(
        cfg, s, ms, **detect_kw)
    s = s._replace(key=key)

    Rbc_t = s.X.Rbc.T
    Rsb_t = s.X.Rsb.T

    def lc_row(slot):
        row = qrow[slot]
        use = inlier[slot]
        Xs_old = ms.Xs[jnp.clip(nn[slot], 0, ms.Xs.shape[0] - 1)
                       ].astype(dtype)
        xp_meas = fr.xp[row]
        Xb = Rsb_t @ (Xs_old - s.X.Tsb)
        Xcn = Rbc_t @ (Xb - s.X.Tbc)
        front = Xcn[2] > 1e-6
        Xcn_s = jnp.where(front, Xcn, jnp.array([0.0, 0.0, 1.0], dtype))
        xcn, dxcn_dXcn = project_persp(Xcn_s)
        xp_pred, dxp_dxcn, _ = cam_mod.project_with_jac(kind, s.cam, xcn)
        dxp_dXcn = dxp_dxcn @ dxcn_dXcn
        H = jnp.zeros((2, D), dtype)
        H = H.at[:, L.WSB:L.WSB + 3].set(dxp_dXcn @ Rbc_t @ so3.hat(Xb))
        H = H.at[:, L.TSB:L.TSB + 3].set(dxp_dXcn @ Rbc_t @ (-Rsb_t))
        H = H.at[:, L.WBC:L.WBC + 3].set(dxp_dXcn @ so3.hat(Xcn_s))
        H = H.at[:, L.TBC:L.TBC + 3].set(dxp_dXcn @ (-Rbc_t))
        inn = xp_meas - xp_pred
        w = (use & front).astype(dtype)
        return H * w, inn * w, use & front

    H, inn, rv = jax.vmap(lc_row)(jnp.arange(F))
    H = H.reshape(2 * F, D)
    inn = inn.reshape(2 * F)
    diagR = jnp.full((2 * F,), cfg.Rlc, dtype)
    err, P = measurement_update(s.P, H, inn, diagR, rv)
    do = jnp.any(rv)
    err = jnp.where(do, err, 0.0)
    P = jnp.where(do, P, s.P)
    s = absorb_error(cfg, s._replace(P=P), err)
    return s, jnp.sum(rv.astype(jnp.int32))


def retire_features(cfg: VIOConfig, s: VIOState, ms: MapState,
                    row_mask) -> MapState:
    """Push features (by table row) into the map with their spatial
    positions + descriptors."""
    fr, gr = s.features, s.groups
    NG = gr.gid.shape[0]
    grow = jnp.clip(fr.ref, 0, NG - 1)

    def xs_of(row):
        Xc, _ = unproject_logz(fr.x[row])
        R = gr.Rsb[grow[row]]
        T = gr.Tsb[grow[row]]
        return R @ (s.X.Rbc @ Xc + s.X.Tbc) + T

    Xs = jax.vmap(xs_of)(jnp.arange(fr.fid.shape[0]))
    ok = row_mask & (fr.ref >= 0)
    return map_insert(ms, Xs, fr.desc, ok)
