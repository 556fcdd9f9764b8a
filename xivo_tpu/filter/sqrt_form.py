"""Square-root (Cholesky-factor) covariance filter — the TPU-native
answer to the reference's double-precision covariance.

The reference keeps the EKF covariance P in double precision
(``common/alias.h:11``) and relies on the Joseph form for PSD-ness
(``src/estimator.cpp:1257-1288``). On TPU the natural dtype is float32
(and matmuls default to bfloat16 passes), where a squared-form P loses
definiteness: the Cholesky inside the gated update NaNs once rounding
makes ``H P H^T + R`` indefinite. SURVEY.md §7.3 names the square-root
formulation as the TPU-native design choice; this module implements it.

Representation: ``s.P`` holds a GENERAL (non-triangular) factor
``S`` of shape (D, D + C) with ``P = S @ S.T``. PSD-ness is therefore
structural — no covariance op can produce an indefinite P, in any
precision. The C = 3*n_features slack columns are an intra-frame
workspace:

* frame start (inside propagation): the discrete-transition map is
  EXACT in factor form (``S[:m] <- Phi @ S[:m]``, no
  re-factorization), and ONE Gram + masked-Cholesky re-compression
  (``factor_propagate_absorb``) absorbs the accumulated process noise
  Qd — added straight into the Gram, never factored itself — together
  with whatever slack the previous frame left, yielding a clean
  lower-triangular (D | 0) factor;
* each feature slot k owns slack band [D+3k : D+3k+3): admission
  writes ``chol(Psub_k)`` there, which makes the new block
  independent of everything by construction (FillCovarianceBlock
  parity, src/feature.cpp:753-776), while the correlated-init
  congruence (init_cov) is a plain ROW transform of the factor;
* measurement downdates preserve zero columns, so the factor stays at
  width D + (3 x admitted-this-frame) until the next frame's
  recompression — there is exactly ONE D x D Cholesky per frame, on
  the batch-in-lanes Pallas kernel (ops/lanes_chol.py).

Measurement updates are ONE-SHOT factor downdates. With W = L^-1 H S
(L = chol(H P H^T + R), m rows) the posterior is P+ = S(I - W^T W)S^T,
and for ANY m x m factor Gam with Gam Gam^T = I - W W^T,

    S+ = S - (S W^T) (I + Gam)^{-1} W

is an exact factor of P+ (expand: J + J^T - J W W^T J^T = I for
J = (I+Gam)^{-1} iff Gam Gam^T = I - W W^T). Crucially,
Gam = L^-1 diag(sqrt(R)) is such a factor FOR FREE (Gam Gam^T =
L^-1 R L^-T = I - W W^T algebraically), it is lower-triangular, so the
whole update is one small Cholesky + two triangular solves + MXU
matmuls — no eigendecomposition, no matrix square root, no LU inverse
(all three measured catastrophically slow in XLA's TPU lowerings:
eigh(60) ~ 38 ms, inv(60) ~ 4.5 ms, QR ~ 26 ms per frame-batch at
B=256). A sequential per-block formulation is also out (HBM-bound:
every 2-row step re-streams the whole factor).

Gauge fixing / slot removal (covariance surgery,
src/estimator.cpp:753-783, 1382-1389) is one-sided: zeroing ROWS of S
zeroes the corresponding rows+columns of P.

Re-compression is Gram + masked Cholesky (S_aug S_aug^T at float32
precision, relative diagonal jitter, frozen/empty rows excluded), NOT
QR: XLA's batched Householder QR runs its panel loop essentially
serially on TPU (~23 ms/frame-batch at these shapes vs ~0.3 ms for
Gram+chol). The jitter (1e-6 relative in f32) dominates the Gram
rounding error, so the Cholesky cannot see a negative pivot — in
particular the exactly-singular P right after a group clone (the new
group's error row EQUALS the body-pose row) factors safely.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dense import HIGHEST
from . import layout as L


def slack_cols(dims) -> int:
    """Intra-frame factor workspace: one 3-column band per feature slot
    (worst case: every slot admitted in one frame, so bulk admission
    keeps full reference parity). Process noise no longer needs slack —
    it is absorbed directly into the re-compression Gram
    (factor_propagate_absorb), which eliminated both the per-frame
    noise-factor Cholesky and 39 slack columns (round 3)."""
    return 3 * dims.n_features


def factor_cols(dims) -> int:
    return dims.full + slack_cols(dims)


def is_sqrt(cfg) -> bool:
    return cfg.covariance_form == "sqrt"


def cov_full(P: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the dense covariance from a factor (identity on a
    square full-form P). Used by accessors / analysis, never in the
    filter hot path."""
    if P.shape[-1] == P.shape[-2]:
        return P
    return jnp.einsum("...ik,...jk->...ij", P, P, precision=HIGHEST)


def factor_from_cov(P_full: jnp.ndarray, dims) -> jnp.ndarray:
    """Masked Cholesky of a dense covariance -> padded factor.

    Rows/cols with zero diagonal (frozen calib states, empty slots,
    gauge-fixed entries) are excluded: their diagonal is set to 1 for
    the factorization and the resulting unit rows are zeroed after, so
    frozen entries stay EXACTLY zero.
    """
    D = P_full.shape[-1]
    diag = jnp.diagonal(P_full, axis1=-2, axis2=-1)
    keep = diag > 0
    eye = jnp.eye(D, dtype=P_full.dtype)
    Pm = jnp.where((keep[..., :, None] & keep[..., None, :]), P_full, eye)
    S = jnp.linalg.cholesky(Pm)
    S = jnp.where(keep[..., :, None], S, 0.0)
    pad = [(0, 0)] * (S.ndim - 1) + [(0, slack_cols(dims))]
    return jnp.pad(S, pad)


def factor_zero_rows(S: jnp.ndarray, keep) -> jnp.ndarray:
    """Factor form of ``zero_state_entries``: zeroing row i of S zeroes
    row AND column i of P = S S^T."""
    return S * keep.astype(S.dtype)[:, None]


def factor_diag(S: jnp.ndarray) -> jnp.ndarray:
    """diag(S S^T) without forming P."""
    return jnp.sum(S * S, axis=-1)


def factor_innovation_blocks(S: jnp.ndarray, H: jnp.ndarray):
    """Per-feature 2x2 innovation blocks H P H^T from the factor.

    H: (2F, D); returns (S00, S01, S11) each (F,) — the only parts of
    H P H^T that MH gating needs (mh_distances parity,
    src/update.cpp:59-70).
    """
    D = H.shape[1]
    V = jnp.matmul(H, S[:D], precision=HIGHEST)       # (2F, Dc)
    Vb = V.reshape(-1, 2, V.shape[-1])
    blk = jnp.einsum("fik,fjk->fij", Vb, Vb, precision=HIGHEST)
    return blk[:, 0, 0], blk[:, 0, 1], blk[:, 1, 1]


def sqrt_update(S: jnp.ndarray, H: jnp.ndarray, inn: jnp.ndarray,
                diagR: jnp.ndarray, row_valid) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """Factor-form EKF update; drop-in for ``joseph_update`` semantics.

    H: (m, D) stacked rows, inn: (m,), diagR: (m,), row_valid: (m,)
    per-row mask (invalid rows get zero H/inn and unit R, contributing
    nothing). One-shot downdate (module docstring):

        W  = L^-1 (H S),  L = chol(H P H^T + R)
        S+ = S - (S W^T) (I + Gam)^{-1} W,  Gam = L^-1 diag(sqrt(R))
        err = (S W^T) (L^-1 inn)

    Exact for the fixed linearization: Gam is lower-triangular with
    Gam Gam^T = I - W W^T algebraically (module docstring). TPU
    realization: (I + Gam)^{-1} W = (I + L^-1 D_R)^{-1} L^-1 V
    = (L + D_R)^{-1} V with D_R = diag(sqrt(R)) — so the whole update
    is ONE fused Cholesky+inverse kernel for L and L^-1, one
    triangular-inverse kernel for (L + D_R), and MXU matmuls. No XLA
    cholesky or triangular_solve lowerings anywhere (each measured
    ~0.7-2.4 ms/frame-batch at these shapes; the lanes kernels run in
    ~0.1-0.3 ms — ops/lanes_chol.py).

    Stacks wider than the fused-inverse compile wall (m > 128 — the
    OOS update at m~216) are processed as SEQUENTIAL block downdates:
    with diagonal R, the EKF update factorizes exactly over row blocks
    when each block's innovation is corrected by the error accumulated
    so far (inn_k - H_k @ err). Every block then rides the fast lanes
    kernels instead of the generic XLA cholesky+solve fallback that
    made the consistency config 3.9x slower than base (round-4 bench,
    bisected in ARCHITECTURE.md "Round-5 perf roadmap").

    Returns (err (D,), S_new).
    """
    from ..ops.lanes_chol import _MAX_INV_UNROLL
    dtype = S.dtype
    m = H.shape[0]
    rv = row_valid.astype(dtype)
    Hm = H * rv[:, None]
    innm = inn * rv
    Rm = jnp.where(row_valid, diagR, jnp.ones((), dtype))

    if m <= _MAX_INV_UNROLL:
        return _sqrt_downdate_block(S, Hm, innm, Rm)

    nblk = -(-m // _MAX_INV_UNROLL)
    bs = -(-m // nblk)                      # balanced static block size
    err = jnp.zeros((S.shape[0],), dtype)
    for k in range(nblk):
        sl = slice(k * bs, min((k + 1) * bs, m))
        inn_k = innm[sl] - jnp.matmul(Hm[sl], err, precision=HIGHEST)
        err_k, S = _sqrt_downdate_block(S, Hm[sl], inn_k, Rm[sl])
        err = err + err_k
    return err, S


def _sqrt_downdate_block(S, Hm, innm, Rm):
    """One masked-row factor downdate (pre-masked inputs); m <= 128."""
    from ..ops.lanes_chol import chol_inv_psd_lanes, tri_inv_psd_lanes
    V = jnp.matmul(Hm, S, precision=HIGHEST)               # (m, Dc)
    Sinn = jnp.matmul(V, V.T, precision=HIGHEST) + jnp.diag(Rm)
    Lc, Linv = chol_inv_psd_lanes(Sinn)
    W = jnp.matmul(Linv, V, precision=HIGHEST)             # L^-1 V
    y = Linv @ innm                                        # L^-1 inn
    SWt = jnp.matmul(S, W.T, precision=HIGHEST)            # (D, m)
    err = SWt @ y
    # Z = (I + Gam)^-1 W = (L + D_R)^-1 V (lower-triangular inverse)
    LRinv = tri_inv_psd_lanes(Lc + jnp.diag(jnp.sqrt(Rm)))
    Z = jnp.matmul(LRinv, V, precision=HIGHEST)
    S = S - jnp.matmul(SWt, Z, precision=HIGHEST)
    return err, S


def chol_unrolled(A: jnp.ndarray, floor) -> jnp.ndarray:
    """Straight-line Cholesky for SMALL static n: n unrolled column
    steps of vectorized outer-product updates. XLA's lax.linalg lowering
    pays a while-loop + dynamic-slice tax that dwarfs the math at these
    sizes (a batched 3x3 cholesky measured ~2 ms/frame-batch on v5e);
    the unrolled form fuses to straight-line VPU code. A (..., n, n)
    PSD (callers add a diagonal jitter >= floor); pivots clamp at floor
    so junk directions factor safely instead of NaN-ing."""
    n = A.shape[-1]
    idx = jnp.arange(n)
    cols = []
    X = A
    for j in range(n):
        pivot = jnp.sqrt(jnp.maximum(X[..., j, j], floor))
        col = X[..., :, j] / pivot[..., None]
        col = col * (idx >= j)
        cols.append(col)
        X = X - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def noise_rows(cfg) -> tuple:
    """Static index set of motion-error rows that can carry process
    noise this config: the IMU-noise image {Wsb, Tsb, Vsb, bg, ba} plus
    any Qmodel-enabled blocks. All other rows of Q_d are EXACTLY zero
    (G has no rows there and their Phi rows are identity — the zero-cov
    freeze semantics of frozen calib states must be preserved)."""
    rows = (list(range(L.WSB, L.WSB + 3)) + list(range(L.TSB, L.TSB + 3))
            + list(range(L.VSB, L.VSB + 3)) + list(range(L.BG, L.BG + 3))
            + list(range(L.BA, L.BA + 3)))
    if cfg.Qmodel_Wbc > 0:
        rows += list(range(L.WBC, L.WBC + 3))
    if cfg.Qmodel_Wsg > 0:
        rows += list(range(L.WSG, L.WSG + 2))
    return tuple(sorted(rows))


def noise_factor(cfg, Qd: jnp.ndarray) -> jnp.ndarray:
    """(MOTION, MOTION) factor of the accumulated process noise.

    Cholesky of the statically-selected noise block with a small
    relative jitter (the f32 accumulation of Q <- Phi Q Phi^T + GQG^T h
    is PSD only up to rounding), embedded back at the static indices so
    noise-free rows stay exactly zero.
    """
    dtype = Qd.dtype
    rows = np.asarray(noise_rows(cfg))
    k = len(rows)
    sub = Qd[np.ix_(rows, rows)]
    rel = 1e-12 if dtype == jnp.float64 else 1e-6
    eps = rel * jnp.trace(sub) / k + jnp.asarray(1e-30, dtype)
    Ls = chol_unrolled(sub + eps * jnp.eye(k, dtype=dtype), eps * 0.5)
    Lq = jnp.zeros((L.MOTION, L.MOTION), dtype)
    return Lq.at[np.ix_(rows, rows)].set(Ls)


def factor_propagate(cfg, S: jnp.ndarray, Phi: jnp.ndarray,
                     Qd: jnp.ndarray) -> jnp.ndarray:
    """LEGACY building block (round-2 flow; the production path is
    factor_propagate_absorb): apply the per-frame transition and write
    a FACTORED process noise into columns [D : D+MOTION) — the caller
    must guarantee those columns are zero and recompress later. Kept
    for the unit tests that pin the noise-factor algebra.
    """
    m = L.MOTION
    D = cfg.dims.full
    Sm = jnp.matmul(Phi, S[:m], precision=HIGHEST)
    S = jnp.concatenate([Sm, S[m:]], axis=0)
    return S.at[:m, D:D + m].set(noise_factor(cfg, Qd))


def factor_recompress(S: jnp.ndarray, D: int, Qd=None) -> jnp.ndarray:
    """Re-compression: squeeze the (D, D+C) factor into D
    lower-triangular columns and re-zero the slack workspace.

    Gram + masked Cholesky (module docstring: XLA's batched QR is ~70x
    slower at these shapes). Empty/frozen/gauge rows are EXACT zeros in
    S by construction; they get a unit pivot for the factorization and
    are re-zeroed after. The relative diagonal jitter dominates the
    float32 Gram rounding so pivots stay positive even for exact clones
    (rows of S duplicated by group admission).

    Qd, if given, is the (MOTION, MOTION) accumulated process noise of
    the frame: it is added straight into the Gram before factoring, so
    the recompression IS the noise injection — no separate noise-factor
    Cholesky and no noise slack columns exist anywhere.
    """
    dtype = S.dtype
    G = jnp.matmul(S, S.T, precision=HIGHEST)
    if Qd is not None:
        m = L.MOTION
        G = G.at[:m, :m].add(Qd)
    rel = 1e-12 if dtype == jnp.float64 else 1e-6
    eye = jnp.eye(D, dtype=dtype)
    Gj = G + (rel * jnp.diagonal(G)) * eye
    from ..ops.lanes_chol import chol_psd_lanes
    Lc = chol_psd_lanes(Gj)
    return jnp.pad(Lc, ((0, 0), (0, S.shape[1] - D)))


def factor_propagate_absorb(cfg, S: jnp.ndarray, Phi: jnp.ndarray,
                            Qd: jnp.ndarray) -> jnp.ndarray:
    """Start-of-frame factor propagation WITH noise absorption.

    The linear map blockdiag(Phi, I) is exact on the factor; the
    process noise and last frame's admission-band slack are then both
    absorbed by ONE Gram + masked-Cholesky re-compression (the noise
    enters the Gram as a plain block add — exact, no factorization of
    Qd needed). The result is a clean (D | zero-slack) factor on which
    the whole update step operates at minimal width. Replaces the
    round-2 flow (noise factor into slack columns at propagation +
    recompression at frame END) at the same algebra but one Cholesky
    per frame TOTAL and 39 fewer factor columns.
    """
    m = L.MOTION
    Sm = jnp.matmul(Phi, S[:m], precision=HIGHEST)
    S = jnp.concatenate([Sm, S[m:]], axis=0)
    return factor_recompress(S, cfg.dims.full, Qd=Qd)


def feature_band(dims, slot_index):
    """Slack-column band owned by a feature slot (static offsets)."""
    return dims.full + 3 * slot_index


def chol3x3(P3):
    """Batched 3x3 Cholesky with relative jitter (subfilter covariances
    are PD up to rounding). Unrolled — see chol_unrolled."""
    rel = 1e-14 if P3.dtype == jnp.float64 else 1e-7
    tr = jnp.trace(P3, axis1=-2, axis2=-1)[..., None, None] / 3.0
    eye = jnp.eye(3, dtype=P3.dtype)
    return chol_unrolled(P3 + (rel * tr + 1e-30) * eye, 1e-30)
