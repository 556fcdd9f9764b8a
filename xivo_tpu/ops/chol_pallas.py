"""Batched Cholesky as a Pallas TPU kernel.

The square-root filter re-compresses its factor once per frame with a
Cholesky of the (D, D) Gram matrix, batched over B independent
sequences (filter/sqrt_form.py). XLA's ``lax.linalg.cholesky`` lowering
runs its column recursion essentially per batch item on TPU — measured
10 ms/frame-batch at (256, 228, 228) f32 on v5e, dominating the whole
frame. The fix is batch-in-lanes: store the matrices as (D, D, B) so
every sequential column step of the factorization is vectorized across
the batch in the VPU lane dimension, and the working tile stays
resident in VMEM across all D steps.

Structure: blocked right-looking Cholesky with column-block width T.
Within a block, T scalar pivot steps update only the (Dp, T, Bc) block
slab; the deferred trailing update to later blocks runs once per block
pair as T fused multiply-subtract passes. Total sequential depth is
O(D) regardless of batch size; total VPU work is the textbook D^3/3 B.

Numerical contract (matches sqrt_form.factor_recompress):
  * pivots clamp at a tiny floor, so EXACTLY-ZERO rows/cols (empty
    slots, gauge-fixed entries, frozen calib states) factor to
    exactly-zero rows/cols — masked-Cholesky semantics for free;
  * callers add a relative diagonal jitter so rounding can never
    produce a negative pivot (the kernel clamps regardless).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(x_ref, out_ref, *, Dp: int, T: int, Bc: int):
    """x_ref/out_ref: (Bc, Dp, Dp) — G in, L out. The refs alias the
    same buffer (input_output_aliases); all work happens on out_ref.

    Batch leads (every sequential column step vectorizes across it).
    Mosaic forbids dynamic slicing along the lane dimension, so column
    blocks sit at STATIC offsets (Python-unrolled, T = 128) and the
    traced column index inside a block is handled purely with iota
    masks + reductions; the deferred block-pair trailing update is one
    MXU dot_general per batch item.
    """
    nb = Dp // T
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)

    out_ref[:] = x_ref[:]   # no-op under aliasing; correct without it

    for jb in range(nb):
        base = jb * T
        R = Dp - base        # active rows: rows above base are final
        row_l = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
        # one-hot row-block selector over the ACTIVE rows: the block's
        # own T rows are local rows [0:T)
        sel_rows = (row_l == lane_i).astype(jnp.float32)

        def col_step(t, _, base=base, R=R, row_l=row_l,
                     sel_rows=sel_rows):
            slab = out_ref[:, base:, base:base + T]          # (Bc,R,T)
            colsel = (lane_i == t).astype(jnp.float32)
            colv = jnp.sum(slab * colsel, axis=2,
                           keepdims=True)                    # (Bc,R,1)
            rowmask = (row_l == t).astype(jnp.float32)
            piv2 = jnp.sum(colv * rowmask, axis=1,
                           keepdims=True)                    # (Bc,1,1)
            # masked-Cholesky semantics: a pivot at/below the floor
            # means the direction is empty (or numerically dead) — zero
            # the whole column instead of dividing by ~1e-15 and
            # flooding it with ~1e8-scale garbage (advisor r2)
            col = jnp.where(piv2 > 1e-30,
                            colv * jax.lax.rsqrt(jnp.maximum(piv2, 1e-30)),
                            0.0)
            col = jnp.where(row_l >= t, col, 0.0)
            # L[base:base+T, j] as lanes, via one-hot reduce (no
            # transpose, no dynamic slice)
            lrow = jnp.sum(col * sel_rows, axis=1,
                           keepdims=True)                    # (Bc,1,T)
            upd = slab - col * lrow
            out_ref[:, base:, base:base + T] = jnp.where(
                lane_i > t, upd, jnp.where(lane_i == t, col, slab))
            return _

        jax.lax.fori_loop(0, T, col_step, 0)
        if base > 0:
            # rows above base of this column block belong to the strict
            # upper triangle of L — zero them once (the restricted col
            # loop no longer touches them)
            out_ref[:, :base, base:base + T] = jnp.zeros(
                (out_ref.shape[0], base, T), jnp.float32)

        # deferred trailing update of later blocks: A_k -= P P_k^T
        for kb in range(jb + 1, nb):
            kbase = kb * T
            P = out_ref[:, base:, base:base + T]             # (Bc,R,T)
            for b in range(Bc):
                Pk = P[b, kbase - base:kbase - base + T, :]  # (T,T)
                upd = jax.lax.dot_general(
                    P[b], Pk, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # (R,T)
                out_ref[b, base:, kbase:kbase + T] = \
                    out_ref[b, base:, kbase:kbase + T] - upd


@functools.partial(jax.jit, static_argnames=("block",))
def cholesky_batched(G: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Lower-triangular Cholesky of a batch of PSD matrices.

    G: (B, D, D) float32/float64. On TPU, runs the batch-in-lanes
    Pallas kernel (float32); elsewhere (CPU tests, x64) falls back to
    XLA's cholesky with the same clamped-pivot semantics emulated by
    the caller's jitter. Zero rows/cols pass through as zero.
    """
    if jax.default_backend() != "tpu" or G.dtype != jnp.float32:
        # masked fallback: unit diagonal on empty rows, re-zeroed after
        diag = jnp.diagonal(G, axis1=-2, axis2=-1)
        keep = diag > 0
        eye = jnp.eye(G.shape[-1], dtype=G.dtype)
        Gm = jnp.where(keep[..., :, None] & keep[..., None, :], G, eye)
        Lc = jnp.linalg.cholesky(Gm)
        return jnp.where(keep[..., :, None], Lc, 0.0)

    B, D, _ = G.shape
    T = block
    Dp = max(int(np.ceil(D / T) * T), 128)
    # in + out (Bc, Dp, Dp) f32 block buffers BOTH occupy VMEM (the
    # io-alias does not dedupe the scoped allocation): Bc=16 -> 8.4 MB
    # total at Dp=256, inside the 16 MB scoped limit with headroom
    Bc = 16
    Bp = int(np.ceil(B / Bc) * Bc)
    Gt = jnp.pad(G, ((0, Bp - B), (0, Dp - D), (0, Dp - D)))

    out = pl.pallas_call(
        functools.partial(_chol_kernel, Dp=Dp, T=T, Bc=Bc),
        out_shape=jax.ShapeDtypeStruct((Bp, Dp, Dp), jnp.float32),
        grid=(Bp // Bc,),
        in_specs=[pl.BlockSpec((Bc, Dp, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Bc, Dp, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        # in + out block buffers plus step temporaries exceed the 16 MB
        # scoped-vmem default by a hair at Bc=16/Dp=256; v5e has VMEM
        # headroom beyond the default cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(Gt)
    return out[:B, :D, :D]


@jax.custom_batching.custom_vmap
def cholesky_psd(G: jnp.ndarray) -> jnp.ndarray:
    """Single-matrix entry point with a CUSTOM VMAP RULE: under vmap
    (the filter's batch runner) the whole batch reaches the batched
    kernel as one pallas_call instead of per-item padded calls."""
    return cholesky_batched(G[None])[0]


@cholesky_psd.def_vmap
def _cholesky_psd_vmap(axis_size, in_batched, G):
    (gb,) = in_batched
    if not gb:
        G = jnp.broadcast_to(G[None], (axis_size,) + G.shape)
    return cholesky_batched(G), True
