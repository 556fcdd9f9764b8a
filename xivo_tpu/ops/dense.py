"""Dense one-hot replacements for TPU-hostile gather/scatter.

The frame pipeline's rule (ARCHITECTURE.md, scatter purge): no
gather/scatter with traced indices in the per-frame path — a traced-index
row gather from a (256,3,3) table measured ~0.5 ms/frame-batch at batch
128 on v5e, while the equivalent one-hot matmul is one dense MXU kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# One-hot selection matmuls are only EXACT at true-f32 matmul precision;
# the bf16-pass TPU default would quantize gathered values (~0.4% error).
# Request it explicitly so correctness never depends on the global
# jax_default_matmul_precision flag set by entrypoints.
HIGHEST = jax.lax.Precision.HIGHEST


def oh_take(arr, idx, n):
    """Row gather ``arr[idx]`` as a one-hot matmul.

    ``idx`` must be pre-clipped to [0, n). Bool arrays use an any-reduce
    (exact); int arrays go through f32 (exact below 2^24).
    """
    if arr.dtype == jnp.bool_:
        oh = idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
        flat = arr.reshape(n, -1)
        out = jnp.any(oh[:, :, None] & flat[None, :, :], axis=1)
        return out.reshape((idx.shape[0],) + arr.shape[1:])
    ft = arr.dtype if jnp.issubdtype(arr.dtype, jnp.floating) else jnp.float32
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(ft)
    flat = arr.reshape(n, -1).astype(ft)
    out = jnp.matmul(oh, flat, precision=HIGHEST).reshape(
        (idx.shape[0],) + arr.shape[1:])
    if arr.dtype != ft:
        out = jnp.rint(out).astype(arr.dtype) \
            if jnp.issubdtype(arr.dtype, jnp.integer) else out.astype(arr.dtype)
    return out
