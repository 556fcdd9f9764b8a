"""Microbench: traced-index scatter/gather ops vs one-hot/argsort
replacements, at bench batch size. Scratch tool for the kernel purge."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np

B, D, NF, NG, G, F = 128, 212, 256, 128, 15, 30
REPS = 30
rng = np.random.default_rng(0)

P = jnp.asarray(rng.standard_normal((B, D, D)), jnp.float32)
idx = jnp.asarray(rng.integers(0, D, (B, D)), jnp.int32)
key = jnp.asarray(rng.standard_normal((B, NF)), jnp.float32)
free = jnp.asarray(rng.random((B, NF)) < 0.3)
want = jnp.asarray(rng.random((B, NF)) < 0.2)
ref = jnp.asarray(rng.integers(0, NG, (B, NF)), jnp.int32)
mask = jnp.asarray(rng.random((B, NF)) < 0.1)
Psub = jnp.asarray(rng.standard_normal((B, NF, 3, 3)), jnp.float32)
rows = jnp.asarray(rng.integers(0, NF, (B, F)), jnp.int32)
Rsb = jnp.asarray(rng.standard_normal((B, NG, 3, 3)), jnp.float32)


def _perturb(x, c):
    """Make x depend on the loop carry c (B,) so XLA can't hoist."""
    ext = c.reshape((B,) + (1,) * (x.ndim - 1))
    if x.dtype == jnp.bool_:
        return x ^ (ext > 1e30)
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x + (ext > 1e30).astype(x.dtype)
    return x + ext.astype(x.dtype) * 1e-30


def timeit(name, fn, *args):
    @jax.jit
    def loop(c0, *a):
        def body(c, _):
            ap = [_perturb(x, c) for x in a]
            out = jnp.sum(jax.vmap(fn)(*ap)).astype(jnp.float32)
            return c + out * 1e-30, None
        out, _ = jax.lax.scan(body, c0, None, length=REPS)
        return out
    c0 = jnp.zeros((B,), jnp.float32)
    out = loop(c0, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(c0, *args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {wall:8.3f} ms")
    return wall


# --- 1. P congruence: gather vs one-hot matmul ---
def p_gather(P, idx):
    return jnp.sum(P[idx][:, idx])


def p_onehot(P, idx):
    R = jax.nn.one_hot(idx, D, dtype=P.dtype)        # (D, D)
    return jnp.sum(R @ P @ R.T)


timeit("P[idx][:,idx] gather", p_gather, P, idx)
timeit("onehot R@P@R.T", p_onehot, P, idx)


# --- 2. rank_assign: scatter version vs argsort version ---
def ra_scatter(free_mask, want_mask, order_key):
    S = free_mask.shape[0]
    N = want_mask.shape[0]
    key = jnp.where(want_mask, order_key, jnp.inf)
    order = jnp.argsort(key)
    rank_of_item = jnp.zeros(N, jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    free_rank = jnp.cumsum(free_mask.astype(jnp.int32)) - 1
    slot_of_rank = jnp.full((N,), S, jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free_mask, free_rank, N)].set(
        jnp.arange(S, dtype=jnp.int32))
    n_free = jnp.sum(free_mask.astype(jnp.int32))
    got = want_mask & (rank_of_item < n_free)
    slot = jnp.where(got, slot_of_rank[jnp.clip(rank_of_item, 0, N - 1)], S)
    return jnp.sum(slot) + jnp.sum(got)


def ra_argsort(free_mask, want_mask, order_key):
    S = free_mask.shape[0]
    N = want_mask.shape[0]
    key = jnp.where(want_mask, order_key, jnp.inf)
    order = jnp.argsort(key)
    rank_of_item = jnp.argsort(order).astype(jnp.int32)
    free_slots = jnp.argsort(~free_mask, stable=True).astype(jnp.int32)
    n_free = jnp.sum(free_mask.astype(jnp.int32))
    slot_of_rank = jnp.where(jnp.arange(S) < n_free, free_slots, S)
    got = want_mask & (rank_of_item < n_free)
    r = jnp.clip(rank_of_item, 0, S - 1)
    slot = jnp.where(got, slot_of_rank[r], S)
    return jnp.sum(slot) + jnp.sum(got)


timeit("rank_assign scatter (S=N=256)", ra_scatter, free, want, key)
timeit("rank_assign argsort (S=N=256)", ra_argsort, free, want, key)


# --- 3. bool scatter vs one-hot any ---
def aff_scatter(mask, ref):
    return jnp.sum(jnp.zeros((NG + 1,), bool).at[
        jnp.where(mask, ref, NG)].set(True))


def aff_onehot(mask, ref):
    oh = (ref[:, None] == jnp.arange(NG)[None, :]) & mask[:, None]
    return jnp.sum(jnp.any(oh, axis=0))


timeit("affected bool scatter", aff_scatter, mask, ref)
timeit("affected onehot any", aff_onehot, mask, ref)


# --- 4. Psub[rows] gather vs one-hot einsum ---
def psub_gather(Psub, rows):
    return jnp.sum(Psub[rows])


def psub_onehot(Psub, rows):
    oh = jax.nn.one_hot(rows, NF, dtype=Psub.dtype)   # (F, NF)
    return jnp.sum(jnp.einsum("fn,nij->fij", oh, Psub))


timeit("Psub[rows] gather (F=30)", psub_gather, Psub, rows)
timeit("Psub onehot einsum", psub_onehot, Psub, rows)


# --- 5. Rsb[grow] gather (NF lookups into NG) vs one-hot matmul ---
def rsb_gather(Rsb, ref):
    return jnp.sum(Rsb[ref])


def rsb_onehot(Rsb, ref):
    oh = jax.nn.one_hot(ref, NG, dtype=Rsb.dtype)     # (NF, NG)
    return jnp.sum((oh @ Rsb.reshape(NG, 9)).reshape(NF, 3, 3))


timeit("Rsb[ref] gather (256 of 128)", rsb_gather, Rsb, ref)
timeit("Rsb onehot matmul", rsb_onehot, Rsb, ref)
