"""Sharded loop-closure retrieval.

The map descriptor table shards across devices; each device scores its
slice with batched Hamming distance and a psum-min picks the global
nearest neighbor — the "sharded descriptor tables + psum-argmin" design
of SURVEY §2.6 for maps too large for one chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..frontend import brief


def make_sharded_matcher(mesh: Mesh, axis: str = "data"):
    """Returns jitted (qdesc (F,8), map_desc (M,8), map_valid (M,)) ->
    (nn_global_idx (F,), nn_dist (F,)) with the map sharded over `axis`."""
    n = mesh.shape[axis]

    def local(qdesc, mdesc, mvalid):
        D = brief.hamming_matrix(qdesc, mdesc)          # (F, M/n)
        D = jnp.where(mvalid[None, :], D, 10_000)
        loc_idx = jnp.argmin(D, axis=1)
        loc_d = jnp.min(D, axis=1)
        shard = jax.lax.axis_index(axis)
        Mloc = mdesc.shape[0]
        glob_idx = shard * Mloc + loc_idx
        # combine across shards: pack (dist, idx) into int32 and take the
        # min — dist <= 10000 needs 14 bits, idx gets 17 (map < 128k per
        # global index space); int64 stays unused (TPU x32 default)
        packed = loc_d.astype(jnp.int32) * (2 ** 17) \
            + jnp.clip(glob_idx, 0, 2 ** 17 - 1).astype(jnp.int32)
        best = jax.lax.pmin(packed, axis)
        return (best % (2 ** 17)).astype(jnp.int32), \
            (best // (2 ** 17)).astype(jnp.int32)

    matcher = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(axis), P(axis)),
                        out_specs=(P(), P()),
                        check_vma=False)
    return jax.jit(matcher)
