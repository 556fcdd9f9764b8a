"""Pallas TPU kernel: fused Hamming nearest-neighbor search.

Loop-closure retrieval scores F query descriptors against an M-entry map
(M up to tens of thousands). The jnp path materializes the (F, M)
distance matrix in HBM before the argmin; this kernel streams map tiles
through VMEM and keeps a running (min, argmin) per query — one HBM pass
over the map, no distance matrix, XOR/popcount on the integer VPU.

Grid: 1D over map tiles. Output accumulators live in VMEM across grid
steps (same output block for every i), using the standard running-
reduction pattern from the Pallas TPU guide.

Measured reality check (TPU v5e, M=131072, F=30): XLA's fused einsum
path (frontend.brief.hamming_matrix + argmin) runs ~0.8 ms vs ~3.6 ms
for this kernel — the grid-step overhead dominates at small F and the
(F, M) matrix easily fits HBM at these sizes, so the mapper keeps the
jnp path as default. The kernel remains as the memory-bounded-regime
alternative (maps where F*M would not fit) and as the building block
for a future fused multi-host retrieval (tile + psum-min in one
kernel); equivalence is pinned by tests/test_ops.py in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512


def _kernel(q_ref, m_ref, valid_ref, best_d_ref, best_i_ref):
    i = pl.program_id(0)

    q = q_ref[:]                 # (F, 8) uint32
    m = m_ref[:]                 # (TILE_M, 8) uint32
    v = valid_ref[:, 0]          # (TILE_M,) int32 (bool as int)

    # (F, TILE_M) distance tile: XOR + popcount, summed over words.
    # Distances are <= 2560 — exactly representable in f32, which Mosaic
    # requires for index reductions (argmin).
    x = jnp.bitwise_xor(q[:, None, :], m[None, :, :])
    d = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
    d = jnp.where(v[None, :] > 0, d, 10_000).astype(jnp.float32)

    tile_min = jnp.min(d, axis=1).astype(jnp.int32)        # (F,)
    tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + i * TILE_M

    @pl.when(i == 0)
    def _init():
        best_d_ref[0, :] = jnp.full_like(tile_min, 10_000)
        best_i_ref[0, :] = jnp.zeros_like(tile_arg)

    better = tile_min < best_d_ref[0, :]
    best_i_ref[0, :] = jnp.where(better, tile_arg, best_i_ref[0, :])
    best_d_ref[0, :] = jnp.where(better, tile_min, best_d_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_nn(qdesc, map_desc, map_valid, interpret: bool = False):
    """(F,8)x(M,8) -> (nn_dist (F,), nn_idx (F,)), fused single pass.

    M is padded to a TILE_M multiple by the caller-visible wrapper.
    """
    F = qdesc.shape[0]
    M = map_desc.shape[0]
    pad = (-M) % TILE_M
    if pad:
        map_desc = jnp.concatenate(
            [map_desc, jnp.zeros((pad, 8), map_desc.dtype)])
        map_valid = jnp.concatenate([map_valid, jnp.zeros((pad,), bool)])
    Mp = map_desc.shape[0]

    grid = (Mp // TILE_M,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, F), jnp.int32),
            jax.ShapeDtypeStruct((1, F), jnp.int32),
        ],
        interpret=interpret,
    )(qdesc, map_desc, map_valid.astype(jnp.int32)[:, None])
    return out[0][0], out[1][0]
