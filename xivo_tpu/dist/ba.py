"""Distributed bundle adjustment over a TPU mesh.

The scaling axis named in the north star: landmark blocks are sharded
across devices; each device builds its local residuals/Jacobians,
eliminates ITS landmarks (3x3 Schur blocks), and the reduced camera
system S, b is summed across the mesh with one psum pair. The dense
(6K, 6K) solve is replicated (it is tiny next to the reduction), and
landmark back-substitution happens shard-locally. Collectives ride ICI;
nothing else crosses devices.

Equivalence contract: for the same problem, the N-device result is
bit-comparable (up to fp reduction order) to the single-device
``ba.core.solve`` — tested on an emulated 8-device CPU mesh
(tests/test_dist.py), the SURVEY §4 pattern for testing multi-node
without a cluster.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ba.core import BAProblem, _build_normal_eq
from ..geom import so3


def _local_reduction(p_shard: BAProblem, damping, huber_thresh, axis):
    """Per-device: normal equations for the local landmark shard."""
    Lm, K = p_shard.mask.shape
    dtype = p_shard.Xs.dtype
    r, Jp, Jx, use, chi2 = _build_normal_eq(p_shard, huber_thresh)

    U = jnp.einsum("lkri,lkrj->kij", Jp, Jp)
    V = jnp.einsum("lkri,lkrj->lij", Jx, Jx) \
        + damping * jnp.eye(3, dtype=dtype)[None]
    W = jnp.einsum("lkri,lkrj->lkij", Jp, Jx)
    bp = -jnp.einsum("lkri,lkr->ki", Jp, r)
    bl = -jnp.einsum("lkri,lkr->li", Jx, r)
    Vinv = jnp.linalg.inv(V)
    WVi = jnp.einsum("lkij,ljm->lkim", W, Vinv)
    S_red = jnp.einsum("lkim,lqjm->kiqj", WVi, W)
    b_red = bp - jnp.einsum("lkim,lm->ki", WVi, bl)

    # the Schur reduction over collectives: one psum for S, one for b
    U_tot = jax.lax.psum(U, axis)
    S_red_tot = jax.lax.psum(S_red, axis)
    b_tot = jax.lax.psum(b_red, axis)
    chi2_tot = jax.lax.psum(jnp.sum(chi2), axis)
    return U_tot, S_red_tot, b_tot, chi2_tot, (W, Vinv, bl)


def _assemble_and_solve(p_fixed, U, S_red, b, damping, K, dtype):
    S = jnp.zeros((K, 6, K, 6), dtype)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
        U + damping * jnp.eye(6, dtype=dtype)[None])
    S = (S - S_red).reshape(6 * K, 6 * K)
    bv = b.reshape(6 * K)
    fixvec = jnp.repeat(p_fixed, 6)
    keep = (~fixvec).astype(dtype)
    S = S * keep[:, None] * keep[None, :] + jnp.diag(fixvec.astype(dtype))
    bv = bv * keep
    c, lower = jax.scipy.linalg.cho_factor(S, lower=True)
    return jax.scipy.linalg.cho_solve((c, lower), bv).reshape(K, 6)


def make_distributed_solver(mesh: Mesh, iters: int = 10,
                            damping: float = 1e-4,
                            huber_thresh: float = 1e9,
                            axis: str = "data"):
    """Returns jitted solve(problem) with landmarks sharded over `axis`.

    The problem's landmark-axis arrays (Xs, obs, mask) must have leading
    dim divisible by the mesh size; poses are replicated.
    """

    def local_iter(p: BAProblem, lam):
        K = p.mask.shape[1]
        dtype = p.Xs.dtype
        U, S_red, b, chi2, (W, Vinv, bl) = _local_reduction(
            p, lam, huber_thresh, axis)
        dp = _assemble_and_solve(p.fixed, U, S_red, b, lam, K, dtype)
        Wtdp = jnp.einsum("lkij,ki->lj", W, dp)
        dl = jnp.einsum("lij,lj->li", Vinv, bl - Wtdp)
        Rs = jax.vmap(lambda R, w: so3.project(R @ so3.exp(w)))(
            p.Rs, dp[:, :3])
        Ts = p.Ts + dp[:, 3:]
        seen = jnp.any(p.mask, axis=1)
        Xs = p.Xs + dl * seen[:, None].astype(dtype)
        return p._replace(Rs=Rs, Ts=Ts, Xs=Xs), chi2

    def _local_chi2(p: BAProblem):
        from ..ba.core import chi2_only
        c, n = chi2_only(p, huber_thresh)
        return jax.lax.psum(c, axis), jax.lax.psum(n, axis)

    def local_solve(p: BAProblem):
        # adaptive LM accept/reject, mirroring ba.core.solve — the
        # accept decision uses the PSUM'd chi2 (identical on every
        # device), the same active-count guard, and the same relative
        # hysteresis margin (ba.core.ACCEPT_MARGIN keeps the decision
        # away from the psum-reduction-order fp-noise boundary, so the
        # N=1-vs-N accept/reject paths agree — advisor r4 findings)
        from ..ba.core import ACCEPT_MARGIN
        dtype = p.Xs.dtype
        lam0 = jnp.asarray(damping, dtype)

        def body(carry, _):
            p, lam = carry
            p_try, chi2_cur = local_iter(p, lam)
            chi2_try, n_try = _local_chi2(p_try)
            _, n_cur = _local_chi2(p)
            accept = (chi2_try < chi2_cur * (1.0 - ACCEPT_MARGIN)) \
                & (n_try >= n_cur)
            p_next = jax.tree.map(
                lambda new, old: jnp.where(accept, new, old), p_try, p)
            lam_next = jnp.where(accept,
                                 jnp.maximum(lam * 0.5, 1e-9),
                                 jnp.minimum(lam * 10.0, 1e6))
            return (p_next, lam_next.astype(dtype)), chi2_cur

        (p, _), hist = jax.lax.scan(body, (p, lam0), None, length=iters)
        return p, hist

    shard_specs = BAProblem(Rs=P(), Ts=P(), Xs=P(axis), obs=P(axis),
                            mask=P(axis), fixed=P())

    solver = shard_map(local_solve, mesh=mesh,
                       in_specs=(shard_specs,),
                       out_specs=(shard_specs, P()),
                       check_vma=False)
    return jax.jit(solver)


def shard_problem(p: BAProblem, mesh: Mesh, axis: str = "data"):
    """Device_put the problem with landmark sharding (host helper)."""
    from jax.sharding import NamedSharding
    specs = BAProblem(Rs=P(), Ts=P(), Xs=P(axis), obs=P(axis),
                      mask=P(axis), fixed=P())
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), p, specs)
