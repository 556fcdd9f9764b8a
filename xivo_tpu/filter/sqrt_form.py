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
precision. The C slack columns are an intra-frame workspace:

* at the START of a frame the last C columns are zero (invariant);
* propagation writes the process-noise factor into slack columns
  [D : D+MOTION) of the motion rows — the discrete-transition map
  itself is EXACT in factor form (``S[:m] <- Phi @ S[:m]``, no
  re-factorization needed);
* each feature slot k owns slack band [D+MOTION+3k : D+MOTION+3k+3):
  admission writes ``chol(Psub_k)`` there, which makes the new block
  independent of everything by construction (FillCovarianceBlock
  parity, src/feature.cpp:753-776), while the correlated-init
  congruence (init_cov) is a plain ROW transform of the factor;
* ONE QR re-compression per frame (end of the frame step) squeezes the
  factor back into its first D columns and re-zeroes the slack.

Measurement updates are factor DOWNDATES with closed-form 2x2 algebra,
sequentially over 2-row blocks (exactly equivalent to the batched
update for a fixed linearization): with V = H_i S, S_inn = V V^T + R,
L = chol(S_inn), B = V^T L^-T, N = B^T B (2x2, eigenvalues in [0,1)),

    P+ = S (I - B B^T) S^T,   (I - B B^T)^{1/2} = I - B G B^T,
    G = (I + sqrtm(I - N))^{-1}            [2x2 closed forms]

so ``S <- S - (S B)(G B^T)`` — all MXU-shaped matmuls, no D x D x D
products (cheaper than the Joseph form), and no matrix square roots
beyond 2x2. Gauge fixing / slot removal (covariance surgery,
src/estimator.cpp:753-783, 1382-1389) is one-sided: zeroing ROWS of S
zeroes the corresponding rows+columns of P.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dense import HIGHEST
from . import layout as L


def slack_cols(dims) -> int:
    """Intra-frame factor workspace: process-noise block + one 3-column
    band per feature slot (worst case: every slot admitted in one frame,
    so bulk admission keeps full reference parity)."""
    return L.MOTION + 3 * dims.n_features


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


def _chol2x2(a, b, c, floor):
    """Closed-form Cholesky of [[a, b], [b, c]] (a, c >= floor > 0)."""
    l00 = jnp.sqrt(jnp.maximum(a, floor))
    l10 = b / l00
    l11 = jnp.sqrt(jnp.maximum(c - l10 * l10, floor))
    return l00, l10, l11


def _sqrtm2x2_psd(A):
    """Principal square root of a 2x2 PSD matrix, closed form:
    sqrt(A) = (A + sqrt(det A) I) / sqrt(tr A + 2 sqrt(det A))."""
    det = jnp.maximum(A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0], 0.0)
    sq = jnp.sqrt(det)
    denom = jnp.sqrt(jnp.maximum(A[0, 0] + A[1, 1] + 2.0 * sq, 1e-30))
    return (A + sq * jnp.eye(2, dtype=A.dtype)) / denom


def _inv2x2(A):
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]],
                     A.dtype) / det


def sqrt_update(S: jnp.ndarray, H: jnp.ndarray, inn: jnp.ndarray,
                diagR: jnp.ndarray, row_valid) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """Factor-form EKF update; drop-in for ``joseph_update`` semantics.

    H: (2K, D) stacked rows, inn: (2K,), diagR: (2K,), row_valid: (2K,)
    per-row mask (invalid rows contribute nothing). Processes the rows
    as K sequential 2-row blocks — exactly equivalent to the batched
    update for the fixed linearization H (information additivity), and
    each block needs only closed-form 2x2 algebra.

    Returns (err (D,), S_new) with err the accumulated state correction
    K @ inn of the joint update.
    """
    dtype = S.dtype
    D = H.shape[1]
    if H.shape[0] % 2:  # odd row count: pad one inert row
        H = jnp.concatenate([H, jnp.zeros((1, D), dtype)])
        inn = jnp.concatenate([inn, jnp.zeros((1,), dtype)])
        diagR = jnp.concatenate([diagR, jnp.ones((1,), dtype)])
        row_valid = jnp.concatenate([row_valid, jnp.zeros((1,), bool)])
    K = H.shape[0] // 2
    rv = row_valid.astype(dtype)
    Hm = (H * rv[:, None]).reshape(K, 2, D)
    innm = (inn * rv).reshape(K, 2)
    Rm = jnp.where(row_valid, diagR, jnp.ones((), dtype)).reshape(K, 2)
    floor = jnp.asarray(1e-20, dtype)

    def step(carry, blk):
        S, delta = carry
        Hi, ri, Ri = blk
        V = jnp.matmul(Hi, S[:D], precision=HIGHEST)      # (2, Dc)
        a = V[0] @ V[0] + Ri[0]
        b = V[0] @ V[1]
        c = V[1] @ V[1] + Ri[1]
        l00, l10, l11 = _chol2x2(a, b, c, floor)
        # innovation re-referenced to the already-applied corrections
        r = ri - Hi @ delta
        # W = L^-1 V  (forward substitution, 2 rows)
        w0 = V[0] / l00
        w1 = (V[1] - l10 * w0) / l11
        # mean: delta += S V^T Sinn^-1 r  = S (W^T (L^-1 r))
        y0 = r[0] / l00
        y1 = (r[1] - l10 * y0) / l11
        delta = delta + jnp.matmul(S, w0 * y0 + w1 * y1,
                                   precision=HIGHEST)
        # covariance downdate: B = W^T, N = W W^T
        N = jnp.array([[w0 @ w0, w0 @ w1], [w0 @ w1, w1 @ w1]], dtype)
        A = jnp.eye(2, dtype=dtype) - N
        G = _inv2x2(jnp.eye(2, dtype=dtype) + _sqrtm2x2_psd(A))
        W = jnp.stack([w0, w1])                            # (2, Dc)
        SB = jnp.matmul(S, W.T, precision=HIGHEST)         # (D, 2)
        S = S - jnp.matmul(SB, G @ W, precision=HIGHEST)
        return (S, delta), None

    (S, delta), _ = jax.lax.scan(
        step, (S, jnp.zeros((S.shape[0],), dtype)), (Hm, innm, Rm))
    return delta, S


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
    Ls = jnp.linalg.cholesky(sub + eps * jnp.eye(k, dtype=dtype))
    Lq = jnp.zeros((L.MOTION, L.MOTION), dtype)
    return Lq.at[np.ix_(rows, rows)].set(Ls)


def factor_propagate(cfg, S: jnp.ndarray, Phi: jnp.ndarray,
                     Qd: jnp.ndarray) -> jnp.ndarray:
    """Apply the per-frame transition + process noise to the factor.

    The linear map blockdiag(Phi, I) is exact on the factor; the noise
    factor lands in the slack columns [D : D+MOTION) (zero at frame
    start by the recompression invariant). Qd must already include
    Qmodel.
    """
    m = L.MOTION
    D = cfg.dims.full
    Sm = jnp.matmul(Phi, S[:m], precision=HIGHEST)
    S = jnp.concatenate([Sm, S[m:]], axis=0)
    return S.at[:m, D:D + m].set(noise_factor(cfg, Qd))


def factor_recompress(S: jnp.ndarray, D: int) -> jnp.ndarray:
    """End-of-frame re-compression: one QR squeezes the (D, D+C) factor
    into D lower-triangular columns and re-zeroes the slack workspace.
    Rounding in QR is benign at any conditioning (no Gram squaring)."""
    R = jnp.linalg.qr(S.T, mode="r")              # (D, D) upper
    return jnp.pad(R.T, ((0, 0), (0, S.shape[1] - D)))


def feature_band(dims, slot_index):
    """Slack-column band owned by a feature slot (static offsets)."""
    base = dims.full + L.MOTION
    return base + 3 * slot_index


def chol3x3(P3):
    """Batched 3x3 Cholesky with relative jitter (subfilter covariances
    are PD up to rounding)."""
    rel = 1e-14 if P3.dtype == jnp.float64 else 1e-7
    tr = jnp.trace(P3, axis1=-2, axis2=-1)[..., None, None] / 3.0
    eye = jnp.eye(3, dtype=P3.dtype)
    return jnp.linalg.cholesky(P3 + (rel * tr + 1e-30) * eye)
