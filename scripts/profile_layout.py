"""Measure TPU cost of small-trailing-dim layouts vs repacked layouts.

Methodology: sequential scan with carried array (forces execution,
one dispatch), REPS iterations, report ms/iteration.
"""
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

B = 128
REPS = 50
rng = np.random.default_rng(0)


def timeit(name, init, step):
    @jax.jit
    def loop(x0):
        def body(x, _):
            return step(x), None
        out, _ = jax.lax.scan(body, x0, None, length=REPS)
        return out

    x0 = init()
    out = loop(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(x0)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {wall:8.4f} ms/iter")
    return wall


# 1. elementwise pass over Psub-like array, 3x3 trailing vs flat 9
timeit("where-pass (B,256,3,3)",
       lambda: jnp.asarray(rng.standard_normal((B, 256, 3, 3)), jnp.float32),
       lambda x: jnp.where(x > 0, x * 0.999, x))
timeit("where-pass (B,256,9)",
       lambda: jnp.asarray(rng.standard_normal((B, 256, 9)), jnp.float32),
       lambda x: jnp.where(x > 0, x * 0.999, x))
timeit("where-pass (B,9,256)",
       lambda: jnp.asarray(rng.standard_normal((B, 9, 256)), jnp.float32),
       lambda x: jnp.where(x > 0, x * 0.999, x))
timeit("where-pass (B,212,212) [P]",
       lambda: jnp.asarray(rng.standard_normal((B, 212, 212)), jnp.float32),
       lambda x: jnp.where(x > 0, x * 0.999, x))

# 2. chain of vmapped 3x3 matmuls (geometry chain shape)
def chain33(x):
    y = x
    for _ in range(10):
        y = jnp.einsum("bij,bjk->bik", y, x)
        y = y / (1.0 + jnp.sum(y ** 2, axis=(1, 2), keepdims=True)) * 3.0
    return y

timeit("10x (B,3,3) matmul+normalize chain",
       lambda: jnp.asarray(rng.standard_normal((B, 3, 3)), jnp.float32),
       chain33)

# 3. batched small matvec: (B,256,3,3) @ (B,256,3)
def mv(x):
    A, v = x
    v2 = jnp.einsum("bnij,bnj->bni", A, v)
    return (A, v2 / (1.0 + jnp.linalg.norm(v2, axis=-1, keepdims=True)))

timeit("batched 3x3 matvec over (B,256)",
       lambda: (jnp.asarray(rng.standard_normal((B, 256, 3, 3)),
                            jnp.float32),
                jnp.asarray(rng.standard_normal((B, 256, 3)), jnp.float32)),
       mv)

# 4. full-P joseph-ish triple product
def triple(x):
    P, H = x
    S = jnp.einsum("bmi,bij,bnj->bmn", H, P, H)       # (B,60,60)
    K = jnp.einsum("bij,bmj->bim", P, H)              # (B,212,60)
    Pn = P - 1e-6 * jnp.einsum("bim,bjm->bij", K, K)
    return (Pn, H)

timeit("joseph-ish triple product (m=60, D=212)",
       lambda: (jnp.asarray(rng.standard_normal((B, 212, 212)), jnp.float32),
                jnp.asarray(rng.standard_normal((B, 60, 212)), jnp.float32)),
       triple)

# 5. scan of 10 tiny substeps (propagate-like): vmapped small ops
def substeps(x):
    def body(c, _):
        R, v = c
        R2 = jnp.einsum("bij,bjk->bik", R, R) * 0.5 + R * 0.5
        v2 = v + jnp.einsum("bij,bj->bi", R2, v) * 1e-3
        return (R2, v2), None
    c, _ = jax.lax.scan(body, x, None, length=10)
    return c

timeit("10 substeps of (B,3,3)+(B,3) ops",
       lambda: (jnp.asarray(rng.standard_normal((B, 3, 3)), jnp.float32),
                jnp.asarray(rng.standard_normal((B, 3)), jnp.float32)),
       substeps)
